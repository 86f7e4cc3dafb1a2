"""End-to-end CLI pipeline tests on a tiny dataset: vocab extraction →
preprocessing shards → DataFolder → training driver → reconstruction."""

import csv
import json
import os

import pytest


@pytest.fixture(scope='module')
def tiny_csv(tmp_path_factory, small_train_data):
    d = tmp_path_factory.mktemp('clidata')
    path = d / 'train.csv'
    with open(path, 'w', newline='') as f:
        w = csv.writer(f)
        w.writerow(['SMILES', 'HOMO', 'LUMO'])
        for s, h, l in small_train_data:
            w.writerow([s, h, l])
    return str(path), str(d)


def test_get_vocab_cli(tiny_csv):
    from ggpm_tpu.cli.get_vocab import main
    path, d = tiny_csv
    out = os.path.join(d, 'vocab.txt')
    main(['--data', path, '--output', out, '--min_frequency', '5'])
    lines = open(out).read().splitlines()
    assert len(lines) > 10
    assert all(len(l.split()) == 3 for l in lines)


def test_preprocess_and_datafolder(tiny_csv):
    from ggpm_tpu.cli.get_vocab import main as vocab_main
    from ggpm_tpu.cli.preprocess import main as prep_main
    from ggpm_tpu.data.dataset import DataFolder
    path, d = tiny_csv
    vocab_path = os.path.join(d, 'vocab2.txt')
    vocab_main(['--data', path, '--output', vocab_path, '--min_frequency', '5'])
    shard_dir = os.path.join(d, 'shards')
    prep_main(['--train', path, '--vocab', vocab_path, '--out-dir', shard_dir,
               '--batch_size', '8', '--ncpu', '1'])
    assert os.listdir(shard_dir)
    batches = list(DataFolder(shard_dir, 8, seed=0))
    assert len(batches) >= 2
    mb = batches[0]
    assert mb.tree.fnode.shape[0] % 32 == 0  # bucket-padded
    # sharded reads partition the files
    n_all = len(DataFolder(shard_dir, 8).data_files)
    n_0 = len(DataFolder(shard_dir, 8, num_shards=2, shard_index=0).data_files)
    n_1 = len(DataFolder(shard_dir, 8, num_shards=2, shard_index=1).data_files)
    assert n_0 + n_1 == n_all


def test_vae_train_cli(tiny_csv, tmp_path):
    from ggpm_tpu.cli.get_vocab import main as vocab_main
    from ggpm_tpu.cli.vae_train import main as train_main
    path, d = tiny_csv
    vocab_path = os.path.join(d, 'vocab3.txt')
    vocab_main(['--data', path, '--output', vocab_path, '--min_frequency', '5'])
    cfg = {
        'vocab_': vocab_path, 'atom_vocab_': None,
        'save_dir': str(tmp_path / 'ckpt'),
        'saved_model': None, 'load_epoch': -1,
        'rnn_type': 'LSTM', 'hidden_size': 48, 'embed_size': 48,
        'latent_size': 12, 'linear_hidden_size': 32,
        'batch_size': 8, 'depthT': 3, 'depthG': 3, 'diterT': 1, 'diterG': 1,
        'dropout': 0.0, 'lr': 1e-3, 'clip_norm': 20.0, 'beta': 0.1,
        'epoch': 1, 'anneal_rate': 0.9, 'print_iter': 1000, 'save_iter': -1,
        'seed': 1,
    }
    cfg_path = str(tmp_path / 'cfg.json')
    with open(cfg_path, 'w') as f:
        json.dump(cfg, f)
    params = train_main(['--path-to-config', cfg_path, '--model-type', 'prop',
                         '--data-csv', path])
    assert params is not None
    assert os.path.exists(str(tmp_path / 'ckpt' / 'model.0'))


def test_configs_roundtrip(tmp_path):
    from ggpm_tpu.configs import Configs
    cfg = {'save_dir': str(tmp_path / 'sd'), 'lr': 1e-3, 'hidden_size': 250,
           'vocab_': 'x.txt'}
    p = str(tmp_path / 'c.json')
    with open(p, 'w') as f:
        json.dump(cfg, f)
    c = Configs(path=p)
    assert c.lr == 1e-3 and c.hidden_size == 250
    assert os.path.isdir(c.save_dir)
    c.to_json(str(tmp_path / 'out.json'))
    c2 = Configs(path=str(tmp_path / 'out.json'))
    assert c2.hidden_size == 250


def test_vae_train_cli_data_parallel(tiny_csv, tmp_path):
    """--n-devices 8 trains green on the virtual CPU mesh: the CLI builds a
    Trainer(mesh=...) whose dp_step shards each group of 8 batches over the
    mesh (VERDICT r2 item 3 — the product path, not just tests)."""
    from ggpm_tpu.cli.get_vocab import main as vocab_main
    from ggpm_tpu.cli.vae_train import main as train_main
    path, d = tiny_csv
    vocab_path = os.path.join(d, 'vocab_dp.txt')
    vocab_main(['--data', path, '--output', vocab_path, '--min_frequency', '5'])
    cfg = {
        'vocab_': vocab_path, 'atom_vocab_': None,
        'save_dir': str(tmp_path / 'ckpt_dp'),
        'saved_model': None, 'load_epoch': -1,
        'rnn_type': 'LSTM', 'hidden_size': 48, 'embed_size': 48,
        'latent_size': 12, 'linear_hidden_size': 32,
        'batch_size': 8, 'depthT': 3, 'depthG': 3, 'diterT': 1, 'diterG': 1,
        'dropout': 0.0, 'lr': 1e-3, 'clip_norm': 20.0, 'beta': 0.1,
        'epoch': 1, 'anneal_rate': 0.9, 'print_iter': 1000, 'save_iter': -1,
        'seed': 1,
    }
    cfg_path = str(tmp_path / 'cfg_dp.json')
    with open(cfg_path, 'w') as f:
        json.dump(cfg, f)
    params = train_main(['--path-to-config', cfg_path, '--model-type', 'prop',
                         '--data-csv', path, '--n-devices', '8'])
    assert params is not None
    assert os.path.exists(str(tmp_path / 'ckpt_dp' / 'model.0'))


def test_reconstruct_and_optimize_cli(tiny_csv, tmp_path, monkeypatch):
    """End-to-end reference drivers 3 and 4: train a tiny prop-opt model,
    reconstruct the training set (reference reconstruct.py CSV layout) and
    run hard latent optimization (reference optimize.py CSV pair) — both
    through the --fast-decode turbo path."""
    from ggpm_tpu.cli.get_vocab import main as vocab_main
    from ggpm_tpu.cli.optimize import main as opt_main
    from ggpm_tpu.cli.reconstruct import main as recon_main
    from ggpm_tpu.cli.vae_train import main as train_main
    path, d = tiny_csv
    vocab_path = os.path.join(d, 'vocab4.txt')
    vocab_main(['--data', path, '--output', vocab_path, '--min_frequency', '5'])
    cfg = {
        'vocab_': vocab_path, 'atom_vocab_': None,
        'save_dir': str(tmp_path / 'ckpt'),
        'saved_model': None, 'load_epoch': -1,
        'rnn_type': 'LSTM', 'hidden_size': 48, 'embed_size': 48,
        'latent_size': 12, 'linear_hidden_size': 32,
        'batch_size': 8, 'depthT': 3, 'depthG': 3, 'diterT': 1, 'diterG': 1,
        'dropout': 0.0, 'lr': 1e-3, 'clip_norm': 20.0, 'beta': 0.1,
        'epoch': 1, 'anneal_rate': 0.9, 'print_iter': 1000, 'save_iter': -1,
        'seed': 1,
        'data': path, 'test_data': path,
        'output_model': str(tmp_path / 'ckpt' / 'model.0'),
        'output': 'rec.csv',
        'latent_lr': 0.5, 'property_optim_step': 2, 'property_delta': 0.01,
        'patience_threshold': 0.01, 'patience': 2, 'optimize_type': 'hard',
    }
    cfg_path = str(tmp_path / 'cfg.json')
    with open(cfg_path, 'w') as f:
        json.dump(cfg, f)
    train_main(['--path-to-config', cfg_path, '--model-type', 'prop-opt',
                '--data-csv', path])
    monkeypatch.chdir(tmp_path)
    rows = recon_main(['--path-to-config', cfg_path,
                       '--model-type', 'prop-opt', '--batch-size', '8',
                       '--max-decode-step', '30', '--fast-decode'])
    assert rows and any(r['reconstructed'] for r in rows)
    assert (tmp_path / 'rec.csv').exists()
    assert (tmp_path / 'rec_logs.pkl').exists()
    opt_main(['--path-to-config', cfg_path, '--model-type', 'prop-opt',
              '--optimize-type', 'hard', '--optim-step', '2',
              '--batch-size', '8', '--fast-decode'])
    assert (tmp_path / 'reconstructed_molecules_after_rec.csv').exists()
    assert (tmp_path / 'property_prediction_after_rec.csv').exists()


def test_quality_run_holdout_pipeline(tiny_csv, tmp_path):
    """The full quality pipeline (vocab → train → holdout recon + enum-root
    + prior sampling → JSON artifact) on a tiny corpus.  Regression for the
    round-2 bug where a smaller-than-batch-size holdout produced an empty
    eval set and an all-zero artifact."""
    import subprocess
    import sys
    path, d = tiny_csv
    out = str(tmp_path / 'Q.json')
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    r = subprocess.run(
        [sys.executable, 'scripts/quality_run.py', '--data', path,
         '--epochs', '1', '--ft-epochs', '0', '--min-freq', '5',
         '--hidden', '32', '--latent', '8', '--batch-size', '8',
         '--holdout', '4', '--enum-root', '2', '--decode-steps', '30',
         '--out', out],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=2400)
    assert r.returncode == 0, r.stderr[-2000:]
    q = json.load(open(out))
    assert q['eval_split'] == 'holdout'
    # the holdout was evaluated: metrics computed over a NON-empty set
    assert 'unique@4' in q, list(q)
    assert q['decode_seconds'] > 0
    assert 'recon_accuracy_enum_root' in q
    assert q['prior_sample']['validity'] >= 0


def test_vae_train_cli_dp_tp(tiny_csv, tmp_path):
    """--n-devices 8 --tp 2 trains over a 2-D (data=4 × model=2) mesh via
    GSPMD: vocab-dim parameters sharded over the model axis, each step
    consuming 4 batches."""
    from ggpm_tpu.cli.get_vocab import main as vocab_main
    from ggpm_tpu.cli.vae_train import main as train_main
    path, d = tiny_csv
    vocab_path = os.path.join(d, 'vocab_tp.txt')
    vocab_main(['--data', path, '--output', vocab_path, '--min_frequency', '5'])
    cfg = {
        'vocab_': vocab_path, 'atom_vocab_': None,
        'save_dir': str(tmp_path / 'ckpt_tp'),
        'saved_model': None, 'load_epoch': -1,
        'rnn_type': 'LSTM', 'hidden_size': 48, 'embed_size': 48,
        'latent_size': 12, 'linear_hidden_size': 32,
        'batch_size': 8, 'depthT': 3, 'depthG': 3, 'diterT': 1, 'diterG': 1,
        'dropout': 0.0, 'lr': 1e-3, 'clip_norm': 20.0, 'beta': 0.1,
        'epoch': 1, 'anneal_rate': 0.9, 'print_iter': 1000, 'save_iter': -1,
        'seed': 1,
        'tp_min_dim': 8,    # tiny vocab: shard anyway so the test is real
    }
    cfg_path = str(tmp_path / 'cfg_tp.json')
    with open(cfg_path, 'w') as f:
        json.dump(cfg, f)
    params = train_main(['--path-to-config', cfg_path, '--model-type', 'prop',
                         '--data-csv', path, '--n-devices', '8', '--tp', '2'])
    assert params is not None
    import jax
    assert any('model' in str(x.sharding.spec)
               for x in jax.tree.leaves(params)), 'no model-axis sharding'
    assert os.path.exists(str(tmp_path / 'ckpt_tp' / 'model.0'))
