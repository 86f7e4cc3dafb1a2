"""End-to-end quality run: vocab → train → fine-tune heads → reconstruct →
metrics.  Produces QUALITY.json with reconstruction/generation metrics and
property MAE for comparison against BASELINE.md (thesis Tables 5.1/5.2).

Usage: python scripts/quality_run.py [--epochs N] [--data PATH]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default='/root/reference/data/hopv15/hopv15.csv')
    ap.add_argument('--epochs', type=int, default=300)
    ap.add_argument('--ft-epochs', type=int, default=150)
    ap.add_argument('--min-freq', type=int, default=10)
    ap.add_argument('--n-test', type=int, default=60)
    ap.add_argument('--hidden', type=int, default=250)
    ap.add_argument('--latent', type=int, default=24)
    ap.add_argument('--batch-size', type=int, default=20)
    ap.add_argument('--out', default='QUALITY.json')
    ap.add_argument('--limit', type=int, default=0)
    ap.add_argument('--model', default='prop-opt',
                    choices=['prop-opt', 'prop', 'hier-prop', 'hier-prop-opt'])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ggpm_tpu.chem import canon_smiles
    from ggpm_tpu.cli.common import read_csv_data
    from ggpm_tpu.data.batching import pad_batch, to_model_batch
    from ggpm_tpu.data.dataset import prune_to_vocab
    from ggpm_tpu.data.vocab_extract import build_vocab
    from ggpm_tpu.eval.metrics import Metrics
    from ggpm_tpu.graph.mol_graph import tensorize
    from ggpm_tpu.graph.vocab import PairVocab, common_atom_vocab
    from ggpm_tpu.models.decode import decode_hier, decode_motif
    from ggpm_tpu.models.vae import ModelConfig, OPVNet
    from ggpm_tpu.train.loop import Trainer
    from ggpm_tpu.train.optim import make_optimizer

    t_start = time.time()
    if args.data.endswith('.txt'):
        data = [[l.strip(), None, None]
                for l in open(args.data) if l.strip()]
    else:
        data = read_csv_data(args.data)
    if getattr(args, 'limit', 0):
        data = data[:args.limit]
    print(f'{len(data)} molecules', flush=True)

    vocab_rows, _ = build_vocab([r[0] for r in data], args.min_freq, ncpu=8)
    vocab = PairVocab([(x, y) for x, y, _ in vocab_rows])
    print(f'vocab {vocab.size()}', flush=True)

    data = prune_to_vocab(data, vocab)
    batch_size = args.batch_size
    batches = []
    for i in range(0, len(data) - batch_size + 1, batch_size):
        try:
            batches.append(pad_batch(tensorize(data[i:i + batch_size], vocab,
                                               common_atom_vocab)))
        except Exception as e:
            print('tensorize skip:', e, flush=True)
    print(f'{len(batches)} train batches in {time.time()-t_start:.0f}s', flush=True)

    is_hier = args.model.startswith('hier')
    cfg = ModelConfig(hvocab_size=vocab.size()[0], ivocab_size=vocab.size()[1],
                      rnn_type='LSTM', hidden_size=args.hidden,
                      embed_size=args.hidden, latent_size=args.latent,
                      linear_hidden_size=128, depthT=20, depthG=20,
                      diterT=1, diterG=3, dropout=0.0,
                      remat=is_hier)  # 3-level scan carries OOM without remat
    model = OPVNet.get_model(args.model)(cfg=cfg)
    decode_fn = decode_hier if is_hier else decode_motif
    opt = make_optimizer(lr=1e-3, clip_norm=20.0, anneal_rate=0.995,
                         steps_per_epoch=len(batches))
    trainer = Trainer(model, opt, vocab.mask, beta=0.1, print_iter=500)
    params, opt_state = trainer.init(batches[0])
    dev_batches = [trainer._device_batch(mb) for mb in batches]

    t0 = time.time()
    for epoch in range(args.epochs + args.ft_epochs):
        for db in dev_batches:
            trainer.rng, r = jax.random.split(trainer.rng)
            params, opt_state, metrics, _ = trainer.step_fn(
                params, opt_state, db, r)
        if epoch % 50 == 0:
            m = {k: round(float(v), 3) for k, v in metrics.items()}
            print(f'epoch {epoch}: {m}', flush=True)
    jax.block_until_ready(params)
    print(f'trained in {time.time()-t0:.0f}s', flush=True)
    ev = trainer.evaluate(params, batches)
    print('final train metrics:', {k: round(v, 3) for k, v in ev.items()}, flush=True)

    # ---- reconstruction + property prediction on the eval subset ----------
    test = data[:args.n_test]
    recon_pairs = []
    homo_err, lumo_err = [], []
    for i in range(0, len(test) - batch_size + 1, batch_size):
        chunk = test[i:i + batch_size]
        mb = tensorize(chunk, vocab, common_atom_vocab)
        batch = jax.tree.map(jnp.asarray, to_model_batch(mb, vocab.mask, pad=False))
        if is_hier:
            z, _ = model.apply(params, batch['tree'],
                               method=lambda m, tree: m.encode_latent(
                                   tree, graph=batch['graph'], perturb=False))
        else:
            z, _ = model.apply(params, batch['tree'],
                               method=lambda m, tree: m.encode_latent(tree, perturb=False))
        if hasattr(model, 'predict_properties'):
            hp, lp = model.apply(params, z,
                                 method=lambda m, zz: m.predict_properties(zz))
            hp, lp = np.asarray(hp), np.asarray(lp)
        else:
            hp = lp = np.full(len(chunk), np.nan)
        for (s, h, l), hh, ll in zip(chunk, hp, lp):
            if h is not None and np.isfinite(hh):
                homo_err.append(abs(hh - h))
            if l is not None and np.isfinite(ll):
                lumo_err.append(abs(ll - l))
        _, smiles = decode_fn(model, params, vocab, common_atom_vocab,
                              np.asarray(z), greedy=True,
                              max_decode_step=150, log_steps=False)
        recon_pairs += list(zip([c[0] for c in chunk], smiles))
        print(f'decoded {len(recon_pairs)} molecules', flush=True)

    gen = [d for _, d in recon_pairs]
    ref = [o for o, _ in recon_pairs]
    M = Metrics()
    qual = M.get_recon_n_sample_metrics(gen, ref)

    # prior sampling quality (thesis also reports sample metrics)
    from ggpm_tpu.models.decode import sample_prior
    _, sampled = sample_prior(model, params, vocab, common_atom_vocab,
                              min(40, batch_size * 2),
                              rng=np.random.default_rng(7),
                              max_decode_step=120, log_steps=False)
    qual['prior_sample'] = {
        'validity': M.validity(sampled),
        'uniqueness': M.uniqueness(sampled),
        'diversity': M.internal_diversity(sampled),
        'SNN_to_train': M.snn(sampled, [r[0] for r in data[:200]]),
    }
    matches = sum(1 for o, d in recon_pairs
                  if d and canon_smiles(o) == canon_smiles(d))
    qual['recon_accuracy'] = matches / max(len(recon_pairs), 1)
    qual['HOMO_MAE'] = float(np.mean(homo_err)) if homo_err else None
    qual['LUMO_MAE'] = float(np.mean(lumo_err)) if lumo_err else None
    qual['train_metrics'] = {k: round(float(v), 4) for k, v in ev.items()}
    qual['wall_seconds'] = round(time.time() - t_start, 1)
    print(json.dumps(qual, indent=2, default=float), flush=True)
    with open(args.out, 'w') as f:
        json.dump(qual, f, indent=2, default=float)

    # persist the trained model for downstream CLIs (reconstruct/optimize)
    from ggpm_tpu.train import checkpoint as ckpt_mod
    ckpt_mod.save_params(params, args.out + '.ckpt')
    from ggpm_tpu.data.vocab_extract import write_vocab
    write_vocab(vocab_rows, args.out + '.vocab.txt')


if __name__ == '__main__':
    main()
