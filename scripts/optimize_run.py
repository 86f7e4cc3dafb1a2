"""Latent property-optimization benchmark (thesis Table 5.3): load a trained
prop-opt checkpoint, push each molecule's latent toward shifted HOMO/LUMO
targets (η = ±20% of the encoded prediction), decode, and report DTT-MAE +
the molecular-weight indicator.

Usage: python scripts/optimize_run.py --ckpt runs/QUALITY.json.ckpt \
           --vocab runs/QUALITY.json.vocab.txt [--policy soft|patience|hard]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default='data/hopv15.csv')
    ap.add_argument('--ckpt', required=True)
    ap.add_argument('--vocab', required=True)
    ap.add_argument('--policy', default='hard',
                    choices=['soft', 'patience', 'hard', 'fixed'])
    ap.add_argument('--eta', type=float, default=0.2)
    ap.add_argument('--latent-lr', type=float, default=0.05)
    ap.add_argument('--steps', type=int, default=50)
    ap.add_argument('--n-test', type=int, default=40)
    ap.add_argument('--hidden', type=int, default=250)
    ap.add_argument('--latent', type=int, default=24)
    ap.add_argument('--out', default='runs/OPTIMIZE.json')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ggpm_tpu.cli.common import read_csv_data
    from ggpm_tpu.data.batching import to_model_batch
    from ggpm_tpu.data.dataset import prune_to_vocab
    from ggpm_tpu.data.vocab_extract import load_vocab_file
    from ggpm_tpu.eval.metrics import Metrics
    from ggpm_tpu.graph.mol_graph import tensorize
    from ggpm_tpu.graph.vocab import common_atom_vocab
    from ggpm_tpu.latent.control import LatentOptimizer
    from ggpm_tpu.models.decode import decode_best
    from ggpm_tpu.models.vae import ModelConfig, PropOptVAE
    from ggpm_tpu.train import checkpoint as ckpt

    vocab, _ = load_vocab_file(args.vocab)
    data = prune_to_vocab(read_csv_data(args.data), vocab)[:args.n_test]

    cfg = ModelConfig(hvocab_size=vocab.size()[0], ivocab_size=vocab.size()[1],
                      rnn_type='LSTM', hidden_size=args.hidden,
                      embed_size=args.hidden, latent_size=args.latent,
                      linear_hidden_size=128, depthT=20, diterT=1)
    model = PropOptVAE(cfg=cfg)

    bs = 20
    mb0 = tensorize(data[:bs], vocab, common_atom_vocab)
    batch0 = jax.tree.map(jnp.asarray, to_model_batch(mb0, vocab.mask, pad=False))
    rng = jax.random.PRNGKey(0)
    from ggpm_tpu.train.loop import init_params_on_cpu
    params = init_params_on_cpu(model, batch0, rng, 0.1)
    params = ckpt.load_params(params, args.ckpt)

    opt = LatentOptimizer(model, params, optimize_type=args.policy,
                          latent_lr=args.latent_lr,
                          property_optim_step=args.steps,
                          property_delta=0.01, patience=5,
                          patience_threshold=0.1)

    originals, optimized = [], []
    new_h, new_l, tgt_h, tgt_l = [], [], [], []
    for i in range(0, len(data) - bs + 1, bs):
        chunk = data[i:i + bs]
        mb = tensorize(chunk, vocab, common_atom_vocab)
        batch = jax.tree.map(jnp.asarray, to_model_batch(mb, vocab.mask, pad=False))
        z, _ = model.apply(params, batch['tree'],
                           method=lambda m, tree: m.encode_latent(tree, perturb=False))
        h0, l0 = model.apply(params, z,
                             method=lambda m, zz: m.predict_properties(zz))
        h0, l0 = np.asarray(h0), np.asarray(l0)
        # targets: shift the current predictions by ±eta (deeper HOMO,
        # shallower LUMO — the usual OPV optimization direction)
        ht = h0 * (1 + args.eta)
        lt = l0 * (1 - args.eta)
        z_opt = opt.optimize(z, ht, lt)
        h1, l1 = model.apply(params, jnp.asarray(z_opt),
                             method=lambda m, zz: m.predict_properties(zz))
        _, smiles = decode_best(model, params, vocab, common_atom_vocab,
                                 np.asarray(z_opt), greedy=True,
                                 max_decode_step=150, log_steps=False)
        originals += [c[0] for c in chunk]
        optimized += smiles
        new_h += list(np.asarray(h1))
        new_l += list(np.asarray(l1))
        tgt_h += list(ht)
        tgt_l += list(lt)
        print(f'optimized {len(optimized)}', flush=True)

    M = Metrics()
    res = M.get_optimization_metrics(
        gen=(originals, optimized),
        org_props=(None, None),
        new_props=(new_h, new_l),
        targets=(tgt_h, tgt_l))
    res['validity'] = M.validity(optimized)
    res['uniqueness'] = M.uniqueness(optimized)
    res['diversity'] = M.internal_diversity(optimized)
    res['policy'] = args.policy
    print(json.dumps(res, indent=2, default=float), flush=True)
    with open(args.out, 'w') as f:
        json.dump(res, f, indent=2, default=float)


if __name__ == '__main__':
    main()
