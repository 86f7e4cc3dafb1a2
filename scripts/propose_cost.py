"""XLA cost analysis of the turbo propose scans (motif vs hier).

Lowers the propose kernels on the CPU backend at product shapes and prints
compiled cost_analysis() — bytes accessed / FLOPs / transcendentals — plus
per-step bytes.  Finds O(buffer)-sized in-scan ops without needing the TPU
(the bytes-accessed accounting is backend-agnostic at the HLO level).

Usage: JAX_PLATFORMS=cpu python scripts/propose_cost.py [--b 120] [--t 150]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--b', type=int, default=120)
    ap.add_argument('--t', type=int, default=150)
    ap.add_argument('--family', default='both',
                    choices=['motif', 'hier', 'both'])
    ap.add_argument('--vocab', default='runs/QUALITY_hier_hopv.json.vocab.txt')
    ap.add_argument('--data', default='data/hopv15.csv')
    args = ap.parse_args()

    import jax
    if 'cpu' in os.environ.get('JAX_PLATFORMS', ''):
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    from ggpm_tpu.cli.common import read_csv_data
    from ggpm_tpu.data.batching import pad_batch, to_model_batch
    from ggpm_tpu.data.dataset import prune_to_vocab
    from ggpm_tpu.data.vocab_extract import load_vocab_file
    from ggpm_tpu.graph.mol_graph import tensorize
    from ggpm_tpu.graph.vocab import common_atom_vocab
    from ggpm_tpu.models import decode as dec_mod
    from ggpm_tpu.models.vae import ModelConfig, OPVNet
    from ggpm_tpu.train.loop import init_params_on_cpu

    vocab, _ = load_vocab_file(args.vocab)
    hv, iv = vocab.size()
    data = prune_to_vocab(read_csv_data(args.data), vocab)[:20]
    mb0 = tensorize(data, vocab, common_atom_vocab)
    batch0 = jax.tree.map(jnp.asarray,
                          to_model_batch(pad_batch(mb0), vocab.mask,
                                         pad=False))
    tabs = dec_mod._assm_tables(vocab, common_atom_vocab)
    mask = jnp.asarray(vocab.mask)
    B, T = args.b, args.t

    def report(name, fn, *fargs):
        t0 = time.time()
        compiled = jax.jit(fn).lower(*fargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        out = {
            'kernel': name,
            'flops': ca.get('flops'),
            'bytes_accessed': ca.get('bytes accessed'),
            'transcendentals': ca.get('transcendentals'),
            'bytes_per_step': round((ca.get('bytes accessed') or 0) / T),
            'gflops_per_step': round((ca.get('flops') or 0) / T / 1e9, 3),
            'compile_s': round(time.time() - t0, 1),
        }
        print(json.dumps(out, indent=1), flush=True)
        return out

    results = []
    if args.family in ('motif', 'both'):
        cfg = ModelConfig(hvocab_size=hv, ivocab_size=iv, rnn_type='LSTM',
                          hidden_size=250, embed_size=250, latent_size=24,
                          linear_hidden_size=128, depthT=20, depthG=20,
                          diterT=1, diterG=3, dropout=0.0)
        model = OPVNet.get_model('prop-opt')(cfg=cfg)
        params = init_params_on_cpu(model, batch0, jax.random.PRNGKey(0),
                                    0.1)
        rv = jnp.zeros((B, cfg.latent_size))
        u = jnp.full((T, B), 0.5)
        pin = jnp.zeros((T, B), jnp.int32)

        def motif_fn(rv):
            return model.apply(
                params, rv, mask, u, pin, pin, pin, tabs, 5,
                method=lambda m, *a: m._decoder().dec_propose(*a))
        results.append(report('motif dec_propose', motif_fn, rv))

    if args.family in ('hier', 'both'):
        cfg = ModelConfig(hvocab_size=hv, ivocab_size=iv, rnn_type='LSTM',
                          hidden_size=250, embed_size=250, latent_size=24,
                          linear_hidden_size=128, depthT=20, depthG=20,
                          diterT=1, diterG=3, dropout=0.0, remat=True)
        model = OPVNet.get_model('hier-prop')(cfg=cfg)
        params = init_params_on_cpu(model, batch0, jax.random.PRNGKey(0),
                                    0.1)
        rv = jnp.zeros((B, cfg.latent_size))
        u = jnp.full((T, B), 0.5)

        def hier_fn(rv):
            return model.apply(
                params, rv, mask, u, tabs, 5,
                method=lambda m, *a: m._decoder().hdec_propose(*a))
        results.append(report('hier hdec_propose', hier_fn, rv))

    with open('runs/PROPOSE_COST.json', 'w') as f:
        json.dump(results, f, indent=2)
    print('wrote runs/PROPOSE_COST.json', flush=True)


if __name__ == '__main__':
    main()
