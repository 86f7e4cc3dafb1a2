"""Fine-tune protocol sweep on curated-OPV (VERDICT r4 item 5).

The reference's curated-OPV numbers (thesis Table 5.2: MotifOpt IO HOMO 1.82
/ LUMO 0.91) come from its full protocol — pretrain on a polymer corpus,
fine-tune the supervised heads on ``data/chem_data/train.csv``, and report
MAE on ``data/chem_data/cleaned_data.csv`` as the TEST set (reference
fine_tuned_property_optim_*_configs.json: ``test_data`` points at
cleaned_data.csv).  Round-3 trained from scratch on 48 of the 60 curated
molecules and tested on 12 — a different, noisier protocol.

This sweep runs the reference's protocol matrix from one shared pretrain:
  EW  equal weights              (loss_scaling=False)
  TD  task-dependent uncertainty (loss_scaling=True, models/heads.LossWeigh;
      reference ggpm/loss_weigh.py:5-23)
  IO  individually-optimized subnetworks (train/optim.make_multi_optimizer;
      reference vae_fine_tune_indv_opt.py:61-70)

and reports per-protocol HOMO/LUMO MAE on the full 60-molecule test set,
plus the predict-the-training-mean baseline and a bootstrap CI so the
result's resolution is explicit.  Writes runs/FT_SWEEP.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

OUT = 'runs/FT_SWEEP.json'
PRE_CKPT = 'runs/FT_SWEEP_pre.ckpt'
VOCAB = 'runs/FT_SWEEP_vocab.txt'


def _load(path):
    from ggpm_tpu.cli.common import read_csv_data
    return read_csv_data(path)


def _tensorize_all(data, vocab, bs):
    """Batch EVERY row: the tail partial batch is kept (pad_batch pads it),
    so no molecule is silently dropped (ADVICE r4: the trailing
    len(data)%bs rows used to vanish — on the curated fine-tune those are
    the most task-relevant molecules)."""
    from ggpm_tpu.data.vocab_extract import tensorize_batches
    from ggpm_tpu.graph.vocab import common_atom_vocab
    raw = [data[i:i + bs] for i in range(0, len(data), bs)]
    batches = tensorize_batches(raw, vocab, common_atom_vocab, ncpu=8)
    n_rows = sum(len(b) for b in raw)
    print(f'  tensorized {n_rows}/{len(data)} rows into {len(batches)} '
          f'batches (tail batch size {len(raw[-1]) if raw else 0})',
          flush=True)
    return batches


def _make_model(vocab, loss_scaling, hidden, latent):
    from ggpm_tpu.models.vae import ModelConfig, OPVNet
    cfg = ModelConfig(hvocab_size=vocab.size()[0], ivocab_size=vocab.size()[1],
                      rnn_type='LSTM', hidden_size=hidden, embed_size=hidden,
                      latent_size=latent, linear_hidden_size=128, depthT=20,
                      depthG=20, diterT=1, diterG=3, dropout=0.0,
                      loss_scaling=loss_scaling)
    return OPVNet.get_model('prop-opt')(cfg=cfg)


def _train(model, vocab, batches, epochs, params=None, optimizer=None,
           seed=1, log_every=50):
    import numpy as np
    from ggpm_tpu.train.loop import Trainer, device_sync
    from ggpm_tpu.train.optim import make_optimizer
    opt = optimizer or make_optimizer(lr=1e-3, clip_norm=20.0,
                                      anneal_rate=0.9,
                                      steps_per_epoch=len(batches))
    tr = Trainer(model, opt, vocab.mask, beta=0.1, print_iter=10 ** 9,
                 seed=seed)
    p0, opt_state = tr.init(batches[0])
    if params is not None:
        import jax
        import jax.numpy as jnp
        from ggpm_tpu.train.checkpoint import copy_matching
        params, n_copied = copy_matching(p0, params)
        # train_step DONATES its params: without a defensive copy the
        # donor tree's buffers are consumed by the first step, and the
        # next protocol's copy_matching returns deleted arrays
        # ("Array has been deleted", runs/ft_sweep_r5.log)
        params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        print(f'  transferred {n_copied} matching leaves', flush=True)
    else:
        params = p0
    dev = [tr._device_batch(b) for b in batches]
    metrics = None
    for epoch in range(epochs):
        for db in dev:
            params, opt_state, metrics, _ = tr.train_step(params, opt_state,
                                                          db)
        if epoch % log_every == 0:
            device_sync(metrics)
            m = {k: round(float(np.asarray(v).reshape(-1)[-1]), 3)
                 for k, v in metrics.items()}
            print(f'  epoch {epoch}: loss {m.get("Loss")} '
                  f'homo {m.get("HOMO_MSE")} lumo {m.get("LUMO_MSE")}',
                  flush=True)
    device_sync(metrics)
    return params


def _mae(model, params, vocab, test):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ggpm_tpu.data.batching import pad_batch, to_model_batch
    from ggpm_tpu.graph.mol_graph import tensorize
    from ggpm_tpu.graph.vocab import common_atom_vocab
    hps, lps, hts, lts = [], [], [], []
    bs = 20
    for i in range(0, len(test), bs):
        chunk = test[i:i + bs]
        mb = tensorize(chunk, vocab, common_atom_vocab)
        batch = jax.tree.map(jnp.asarray,
                             to_model_batch(pad_batch(mb), vocab.mask,
                                            pad=False))
        z, _ = model.apply(params, batch['tree'],
                           method=lambda m, t: m.encode_latent(t,
                                                               perturb=False))
        hp, lp = model.apply(params, z,
                             method=lambda m, zz: m.predict_properties(zz))
        hps += list(np.asarray(hp)[:len(chunk)])
        lps += list(np.asarray(lp)[:len(chunk)])
        hts += [h for _, h, _ in chunk]
        lts += [l for _, _, l in chunk]
    he = np.abs(np.array(hps) - np.array(hts, float))
    le = np.abs(np.array(lps) - np.array(lts, float))
    rng = np.random.default_rng(0)
    boot_h = [float(np.mean(rng.choice(he, len(he)))) for _ in range(2000)]
    boot_l = [float(np.mean(rng.choice(le, len(le)))) for _ in range(2000)]
    return {
        'HOMO_MAE': round(float(he.mean()), 4),
        'LUMO_MAE': round(float(le.mean()), 4),
        'HOMO_MAE_ci90': [round(float(np.percentile(boot_h, 5)), 4),
                          round(float(np.percentile(boot_h, 95)), 4)],
        'LUMO_MAE_ci90': [round(float(np.percentile(boot_l, 5)), 4),
                          round(float(np.percentile(boot_l, 95)), 4)],
        'n_test': len(he),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--hidden', type=int, default=400)
    ap.add_argument('--latent', type=int, default=48)
    ap.add_argument('--pre-epochs', type=int, default=150)
    ap.add_argument('--ft-epochs', type=int, default=150)
    ap.add_argument('--protocols', default='EW,TD,IO,IO2')
    ap.add_argument('--skip-pretrain', action='store_true')
    args = ap.parse_args()

    import numpy as np
    from ggpm_tpu.data.dataset import prune_to_vocab
    from ggpm_tpu.data.vocab_extract import build_vocab, load_vocab_file
    from ggpm_tpu.graph.vocab import PairVocab
    from ggpm_tpu.train import checkpoint as ckpt_mod

    # Unit hygiene (the round-4 CPU artifact's LUMO-regression root cause):
    # hopv15.csv labels are Hartree (mean HOMO -0.19), cleaned_data.csv is
    # eV (mean HOMO -5.5), and chem_data/train.csv's LUMO column is a
    # THIRD convention (mean +2.59 — positive, incompatible with
    # cleaned_data's -3.87; fine-tuning on it drives test LUMO MAE to the
    # mean-baseline).  The reference's own fine-tune corpus
    # (trio_chem_supervised_train_data.csv) is absent from its checkout,
    # but its prediction CSVs show eV-scale targets — so the sweep uses
    # eV everywhere: HOPV15 converted at 27.2114 eV/Ha, curated-OPV as-is,
    # and train.csv only unsupervised (labels dropped).
    HA_TO_EV = 27.2114
    hopv = [[s, None if h is None else h * HA_TO_EV,
             None if l is None else l * HA_TO_EV]
            for s, h, l in _load('data/hopv15.csv')]
    ft_unsup = [[s, None, None] for s, _, _ in
                _load('data/chem_data/train.csv')]
    test = _load('data/chem_data/cleaned_data.csv')

    if os.path.exists(VOCAB) and args.skip_pretrain:
        vocab, _ = load_vocab_file(VOCAB)
    else:
        rows, _ = build_vocab([r[0] for r in hopv + ft_unsup + test],
                              min_frequency=2, ncpu=8)
        with open(VOCAB, 'w') as f:
            for x, y, b in rows:
                f.write(f'{x} {y} {b}\n')
        vocab = PairVocab([(x, y) for x, y, _ in rows])
    print(f'vocab {vocab.size()}', flush=True)
    def _labeled(rows):
        return [r for r in rows if r[1] is not None and r[2] is not None]

    # pretrain: reconstruction over everything non-holdout (hopv labels
    # supervise in eV; train.csv rows ride label-free)
    pre_data = prune_to_vocab(hopv + ft_unsup, vocab)
    # cleaned_data.csv carries rows without measured HOMO/LUMO — MAE is
    # only defined on the labeled ones.  Disjoint 34/12 split for the
    # honest row; the full-46 row mirrors the reference protocol (whose
    # trio fine-tune corpus overlaps its cleaned_data test set).
    cur_labeled = _labeled(prune_to_vocab(test, vocab))
    import random as _random
    _random.Random(11).shuffle(cur_labeled)
    cur_hold, cur_train = cur_labeled[:12], cur_labeled[12:]
    ft_data = _labeled(prune_to_vocab(hopv, vocab)) + cur_train
    _random.Random(13).shuffle(ft_data)  # mix curated rows across batches
    print(f'pretrain {len(pre_data)} / ft {len(ft_data)} '
          f'(curated {len(cur_train)}) / test {len(cur_hold)} holdout '
          f'+ {len(cur_labeled)} full', flush=True)

    report = {'hidden': args.hidden, 'latent': args.latent,
              'pre_epochs': args.pre_epochs, 'ft_epochs': args.ft_epochs,
              'protocol_note': 'eV units everywhere (HOPV15 x27.2114); '
                               'pretrain hopv15+train.csv (recon) -> '
                               'fine-tune hopv15-eV + 34 curated -> test '
                               '12-mol disjoint holdout AND all 46 '
                               'labeled cleaned_data rows (reference '
                               'protocol; its trio corpus overlaps the '
                               'test set)'}
    # predict-the-training-mean baseline: the resolution floor of the task
    hmean = float(np.mean([h for _, h, _ in cur_train]))
    lmean = float(np.mean([l for _, _, l in cur_train]))
    report['mean_baseline'] = {
        k: {'HOMO_MAE': round(float(np.mean(
                [abs(h - hmean) for _, h, _ in rows])), 4),
            'LUMO_MAE': round(float(np.mean(
                [abs(l - lmean) for _, _, l in rows])), 4)}
        for k, rows in (('holdout12', cur_hold), ('full46', cur_labeled))}
    print('mean baseline', report['mean_baseline'], flush=True)
    # the reference's own fine-tuned prediction CSVs, recomputed with this
    # shared MAE (same 46 molecules; see PARITY_RESULTS.md)
    report['reference_csv_recomputed'] = {
        'best_HOMO_MAE': 0.657, 'best_LUMO_MAE': 0.545,
        'source': 'predictions/motif_chem_trio_fine_tuned_wo_tie_embedding'
                  '_prediction_early_stopping_loss_scaling*.csv'}

    model_ew = _make_model(vocab, False, args.hidden, args.latent)
    pre_batches = _tensorize_all(pre_data, vocab, 20)
    if args.skip_pretrain and os.path.exists(PRE_CKPT):
        from ggpm_tpu.train.loop import init_params_on_cpu, Trainer
        from ggpm_tpu.train.optim import make_optimizer
        tr = Trainer(model_ew, make_optimizer(1e-3, 20.0, 0.9, 1), vocab.mask,
                     beta=0.1, print_iter=10 ** 9)
        pre_params, _ = tr.init(pre_batches[0])
        pre_params = ckpt_mod.load_params(pre_params, PRE_CKPT)
    else:
        t0 = time.time()
        print(f'pretraining on {len(pre_batches)} batches', flush=True)
        pre_params = _train(model_ew, vocab, pre_batches, args.pre_epochs)
        ckpt_mod.save_params(pre_params, PRE_CKPT)
        print(f'pretrained in {time.time()-t0:.0f}s', flush=True)
    report['pretrain_mae_on_test'] = _mae(model_ew, pre_params, vocab,
                                          cur_hold)
    print('pretrain MAE', report['pretrain_mae_on_test'], flush=True)

    ft_batches = _tensorize_all(ft_data, vocab, 20)
    results = {}
    for proto in args.protocols.split(','):
        t0 = time.time()
        print(f'== fine-tune {proto} ==', flush=True)
        if proto == 'EW':
            model = model_ew
            optimizer = None
        elif proto == 'TD':
            model = _make_model(vocab, True, args.hidden, args.latent)
            optimizer = None
        elif proto in ('IO', 'IO2'):
            model = model_ew
            from ggpm_tpu.train.optim import (default_group_fn,
                                              make_multi_optimizer)
            # IO2 = the reference's only published per-subnetwork LRs
            # (fine_tuned_property_optim_w_tie_embedding_hier_indv_opt_
            # configs.json: lr 1e-4, homo_lr 5e-5, lumo_lr 1e-5); IO keeps
            # the uniform 1e-3 of the motif configs
            lrs = ({'encoder': 1e-4, 'decoder': 1e-4,
                    'homo': 5e-5, 'lumo': 1e-5} if proto == 'IO2' else
                   {'encoder': 1e-3, 'decoder': 1e-3,
                    'homo': 1e-3, 'lumo': 1e-3})
            optimizer = make_multi_optimizer(
                default_group_fn, lrs,
                clip_norm=20.0, anneal_rate=0.9,
                steps_per_epoch=len(ft_batches))
        else:
            raise ValueError(proto)
        params = _train(model, vocab, ft_batches, args.ft_epochs,
                        params=pre_params, optimizer=optimizer)
        results[proto] = {
            'holdout12': _mae(model, params, vocab, cur_hold),
            'full46': _mae(model, params, vocab, cur_labeled)}
        results[proto]['seconds'] = round(time.time() - t0, 1)
        print(proto, results[proto], flush=True)
        ckpt_mod.save_params(params, f'runs/FT_SWEEP_{proto}.ckpt')

    import jax
    report['protocols'] = results
    report['platform'] = jax.devices()[0].platform
    with open(OUT, 'w') as f:
        json.dump(report, f, indent=2)
    print('wrote', OUT, flush=True)


if __name__ == '__main__':
    main()
