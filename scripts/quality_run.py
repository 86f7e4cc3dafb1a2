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
    ap.add_argument('--data', default='data/hopv15.csv')
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
    ap.add_argument('--holdout', type=int, default=0,
                    help='hold out N molecules from training and evaluate '
                         'reconstruction/property MAE on them (test-split '
                         'protocol; default 0 = evaluate on training mols '
                         'as in round-1 artifacts)')
    ap.add_argument('--eval-data', default=None,
                    help='evaluate on this file instead of a holdout slice '
                         '(e.g. the untouched polymers test.txt — a true '
                         'test split the reference ships but never uses)')
    ap.add_argument('--eval-limit', type=int, default=0,
                    help='cap the --eval-data set size')
    ap.add_argument('--enum-root', type=int, default=6,
                    help='also evaluate reconstruction with the enum-root '
                         'protocol (reference MolEnumRootDataset, '
                         'dataset.py:46-75): re-root each eval molecule at '
                         'up to N leaves and count success if ANY rooting '
                         'round-trips; 0 disables')
    ap.add_argument('--decode-steps', type=int, default=150,
                    help='autoregressive decode budget (reference cap 150; '
                         'lower it for smoke tests — compile time scales '
                         'with the scan length)')
    ap.add_argument('--load-ckpt', default=None,
                    help='initialise params from this checkpoint instead of '
                         'training from scratch (combine with --epochs 0 '
                         '--ft-epochs 0 for an eval-only run; --data/'
                         '--min-freq must match the saving run so the '
                         'rebuilt vocab is identical)')
    ap.add_argument('--dump-recon', default=None,
                    help='write original,reconstructed,org_homo,org_lumo,'
                         'homo,lumo CSV (reference reconstruct.py:78-97 '
                         'format) for the parity harness')
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
    if args.eval_data:
        if args.eval_data.endswith('.txt'):
            eval_rows = [[l.strip(), None, None]
                         for l in open(args.eval_data) if l.strip()]
        else:
            eval_rows = read_csv_data(args.eval_data)
        if args.eval_limit:
            eval_rows = eval_rows[:args.eval_limit]
        # same vocab-pruning the reference's MoleculeDataset applies to any
        # eval set (reference dataset.py:20-34)
        eval_rows = prune_to_vocab(eval_rows, vocab)
        holdout = eval_rows
        print(f'evaluating on {len(holdout)} molecules from '
              f'{args.eval_data}; training on {len(data)}', flush=True)
    elif args.holdout > 0:
        # deterministic split: the motif vocab comes from the FULL set so
        # held-out molecules are tensorizable at eval time.  (The reference
        # builds its vocab from the training set only — README step 1 —
        # but it also never evaluates held-out molecules: its
        # reconstruction CSVs reconstruct training data, and its
        # MoleculeDataset silently drops out-of-vocab molecules.  A
        # train-only vocab would make holdout reconstruction undefined for
        # any molecule with unseen motifs.)  Training never sees the
        # held-out molecules' tensors; only motif IDENTITIES leak.
        import random as _random
        _random.Random(1).shuffle(data)
        holdout, data = data[:args.holdout], data[args.holdout:]
        print(f'held out {len(holdout)} molecules; training on {len(data)}',
              flush=True)
    else:
        holdout = None
    batch_size = args.batch_size
    from ggpm_tpu.data.vocab_extract import tensorize_batches
    raw = [data[i:i + batch_size]
           for i in range(0, len(data) - batch_size + 1, batch_size)]
    batches = tensorize_batches(raw, vocab, common_atom_vocab, ncpu=8)
    print(f'{len(batches)} train batches in {time.time()-t_start:.0f}s', flush=True)

    is_hier = args.model.startswith('hier')
    cfg = ModelConfig(hvocab_size=vocab.size()[0], ivocab_size=vocab.size()[1],
                      rnn_type='LSTM', hidden_size=args.hidden,
                      embed_size=args.hidden, latent_size=args.latent,
                      linear_hidden_size=128, depthT=20, depthG=20,
                      diterT=1, diterG=3, dropout=0.0,
                      remat=is_hier)  # 3-level scan carries OOM without remat
    model = OPVNet.get_model(args.model)(cfg=cfg)
    from ggpm_tpu.models.decode import decode_best as decode_fn
    opt = make_optimizer(lr=1e-3, clip_norm=20.0, anneal_rate=0.995,
                         steps_per_epoch=len(batches))
    trainer = Trainer(model, opt, vocab.mask, beta=0.1, print_iter=500)
    params, opt_state = trainer.init(batches[0])
    if args.load_ckpt:
        from ggpm_tpu.train import checkpoint as _ckpt
        params = _ckpt.load_params(params, args.load_ckpt)
        print(f'loaded params from {args.load_ckpt}', flush=True)
    dev_batches = [trainer._device_batch(mb) for mb in batches]

    # group same-shape batches and run each group's steps as ONE lax.scan
    # device call per epoch (bit-identical to sequential steps; dispatch
    # volume drops by the group size — kind to the flaky TPU relay)
    from collections import defaultdict
    from ggpm_tpu.train.loop import device_sync, stack_batches
    groups = defaultdict(list)
    for db in dev_batches:
        groups[tuple(getattr(l, 'shape', ()) for l in
                     jax.tree.leaves(db))].append(db)
    stacks = [db_list[0] if len(db_list) == 1 else stack_batches(db_list)
              for db_list in groups.values()]
    singles = [len(g) == 1 for g in groups.values()]

    t0 = time.time()
    n_epochs = args.epochs + args.ft_epochs
    metrics = None
    for epoch in range(n_epochs):
        for st_batch, single in zip(stacks, singles):
            if single:
                params, opt_state, metrics, _ = trainer.train_step(
                    params, opt_state, st_batch)
            else:
                params, opt_state, metrics, _ = trainer.scan_steps(
                    params, opt_state, st_batch)
        # real value-fetch sync every few epochs: block_until_ready is
        # non-functional here (see ggpm_tpu.train.loop.device_sync), and
        # an unsynced loop queues the entire run onto the device in
        # seconds, starving everything behind it on the shared relay
        if epoch % 5 == 0:
            device_sync(metrics)
        if epoch % 50 == 0:
            m = {k: round(float(np.asarray(v).reshape(-1)[-1]), 3)
                 for k, v in metrics.items()}
            print(f'epoch {epoch}: {m}', flush=True)
    if metrics is not None:
        device_sync(metrics)
    print(f'trained in {time.time()-t0:.0f}s', flush=True)
    # checkpoint the trained model IMMEDIATELY: the round-4 TPU polymers
    # run hit its external timeout during the eval phase and lost a fully
    # trained model (the ckpt used to be written only at the very end)
    if n_epochs > 0:
        from ggpm_tpu.data.vocab_extract import write_vocab
        from ggpm_tpu.train import checkpoint as _ckpt_early
        _ckpt_early.save_params(params, args.out + '.ckpt')
        write_vocab(vocab_rows, args.out + '.vocab.txt')
        print(f'checkpoint saved to {args.out}.ckpt', flush=True)
    ev = trainer.evaluate(params, batches)
    print('final train metrics:', {k: round(v, 3) for k, v in ev.items()}, flush=True)

    # ---- reconstruction + property prediction on the eval subset ----------
    # encode in training-size chunks; decode in LARGE batches — each decode
    # step costs one tunnel round-trip regardless of batch size
    test = holdout if holdout is not None else data[:args.n_test]
    kept, zs, hps, lps = [], [], [], []
    # include the tail chunk: eval encodes with pad=False so any size works
    # (a <batch_size holdout previously produced an empty eval set)
    for i in range(0, len(test), batch_size):
        chunk = test[i:i + batch_size]
        if not chunk:
            break
        mb = tensorize(chunk, vocab, common_atom_vocab)
        # bucket-pad the encode: padded and raw encodes are bit-identical
        # (index-0 padding convention), and bucketed shapes compile a
        # handful of times instead of once per chunk — at the 5k-molecule
        # polymers eval, pad=False meant ~250 distinct compile shapes
        batch = jax.tree.map(jnp.asarray,
                             to_model_batch(pad_batch(mb), vocab.mask,
                                            pad=False))
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
        kept += chunk
        zs.append(np.asarray(z))
        hps.append(hp)
        lps.append(lp)
    zs = np.concatenate(zs) if zs else np.zeros((0, args.latent))
    hps = np.concatenate(hps) if hps else np.zeros(0)
    lps = np.concatenate(lps) if lps else np.zeros(0)

    homo_err = [abs(hh - h) for (s, h, l), hh in zip(kept, hps)
                if h is not None and np.isfinite(hh)]
    lumo_err = [abs(ll - l) for (s, h, l), ll in zip(kept, lps)
                if l is not None and np.isfinite(ll)]

    recon_pairs = []
    recon_rows = []
    t_dec = time.time()
    dec_bs = min(120, max(len(kept), 1))
    for i in range(0, len(kept), dec_bs):
        chunk = kept[i:i + dec_bs]
        _, smiles = decode_fn(model, params, vocab, common_atom_vocab,
                              zs[i:i + dec_bs], greedy=True,
                              max_decode_step=args.decode_steps,
                              log_steps=False)
        recon_pairs += list(zip([c[0] for c in chunk], smiles))
        for (s, h, l), dec, hh, ll in zip(chunk, smiles, hps[i:i + dec_bs],
                                          lps[i:i + dec_bs]):
            recon_rows.append((s, dec or '', h, l,
                               float(hh) if np.isfinite(hh) else '',
                               float(ll) if np.isfinite(ll) else ''))
        print(f'decoded {len(recon_pairs)} molecules '
              f'({time.time()-t_dec:.0f}s)', flush=True)
    decode_seconds = time.time() - t_dec

    gen = [d for _, d in recon_pairs]
    ref = [o for o, _ in recon_pairs]
    M = Metrics()
    qual = M.get_recon_n_sample_metrics(gen, ref)

    # prior sampling quality (thesis also reports sample metrics)
    from ggpm_tpu.models.decode import sample_prior
    _, sampled = sample_prior(model, params, vocab, common_atom_vocab,
                              min(40, batch_size * 2),
                              rng=np.random.default_rng(7),
                              max_decode_step=min(120, args.decode_steps),
                              log_steps=False)
    qual['prior_sample'] = {
        'validity': M.validity(sampled),
        'uniqueness': M.uniqueness(sampled),
        'diversity': M.internal_diversity(sampled),
        'SNN_to_train': M.snn(sampled, [r[0] for r in data[:200]]),
    }
    matches = sum(1 for o, d in recon_pairs
                  if d and canon_smiles(o) == canon_smiles(d))
    qual['recon_accuracy'] = matches / max(len(recon_pairs), 1)
    if args.enum_root and kept:
        from ggpm_tpu.models.api import reconstruct_enum_roots
        t_enum = time.time()
        enum_out = reconstruct_enum_roots(
            model, params, [r[0] for r in kept], vocab, common_atom_vocab,
            max_roots=args.enum_root,
            max_decode_step=args.decode_steps)
        qual['recon_accuracy_enum_root'] = (
            sum(1 for _, _, m in enum_out if m) / len(enum_out))
        qual['enum_root_seconds'] = round(time.time() - t_enum, 1)
        print(f'enum-root recon: {qual["recon_accuracy_enum_root"]:.3f} '
              f'({qual["enum_root_seconds"]}s)', flush=True)
    qual['HOMO_MAE'] = float(np.mean(homo_err)) if homo_err else None
    qual['LUMO_MAE'] = float(np.mean(lumo_err)) if lumo_err else None
    qual['train_metrics'] = {k: round(float(v), 4) for k, v in ev.items()}
    qual['wall_seconds'] = round(time.time() - t_start, 1)
    qual['decode_seconds'] = round(decode_seconds, 1)
    qual['decode_mols_per_sec'] = round(len(recon_pairs) /
                                        max(decode_seconds, 1e-9), 2)
    qual['eval_split'] = 'holdout' if holdout is not None else 'train'
    # honest provenance: artifacts regenerated on the CPU backend during
    # relay outages must say so (protocol is identical; wall times differ)
    qual['platform'] = jax.devices()[0].platform
    print(json.dumps(qual, indent=2, default=float), flush=True)
    with open(args.out, 'w') as f:
        json.dump(qual, f, indent=2, default=float)

    if args.dump_recon:
        import csv as _csv
        with open(args.dump_recon, 'w', newline='') as f:
            w = _csv.writer(f)
            w.writerow(['original', 'reconstructed', 'org_homo', 'org_lumo',
                        'homo', 'lumo'])
            w.writerows(recon_rows)
        print(f'wrote {args.dump_recon}', flush=True)

    # persist the trained model for downstream CLIs (reconstruct/optimize)
    from ggpm_tpu.train import checkpoint as ckpt_mod
    ckpt_mod.save_params(params, args.out + '.ckpt')
    from ggpm_tpu.data.vocab_extract import write_vocab
    write_vocab(vocab_rows, args.out + '.vocab.txt')


if __name__ == '__main__':
    main()
