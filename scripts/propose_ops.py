"""Count primitives in the propose-scan while-loop body (motif + hier).

The propose scans are op-LAUNCH-bound on TPU (runs/PROPOSE_COST.json,
STATUS round-3): wall time ~= body primitive count x per-op dispatch
latency x realized steps.  This prints the body's jaxpr primitive
histogram so op-reduction work targets the real distribution.

Usage: JAX_PLATFORMS=cpu python scripts/propose_ops.py [--family motif|hier]
"""

import argparse
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def body_counts(jaxpr, out=None, depth=0):
    """Find while-loop bodies and count their primitives (recursively)."""
    if out is None:
        out = []
    for eqn in jaxpr.eqns:
        params = eqn.params or {}
        if eqn.primitive.name == 'while':
            body = params['body_jaxpr'].jaxpr
            c = Counter()
            flat_count(body, c)
            out.append((depth, c))
            body_counts(body, out, depth + 1)
        else:
            for pname in ('jaxpr', 'call_jaxpr', 'fun_jaxpr', 'cond_jaxpr'):
                sub = params.get(pname)
                if sub is not None:
                    body_counts(getattr(sub, 'jaxpr', sub), out, depth)
            for br in params.get('branches', ()):
                body_counts(br.jaxpr, out, depth)
    return out


def flat_count(jaxpr, c):
    for eqn in jaxpr.eqns:
        params = eqn.params or {}
        handled = False
        for pname in ('jaxpr', 'call_jaxpr', 'fun_jaxpr'):
            sub = params.get(pname)
            if sub is not None:
                flat_count(getattr(sub, 'jaxpr', sub), c)
                handled = True
                break
        if not handled and eqn.primitive.name in ('while', 'cond', 'scan'):
            c[eqn.primitive.name] += 1   # nested control kept opaque
        elif not handled:
            c[eqn.primitive.name] += 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--family', default='motif', choices=['motif', 'hier'])
    ap.add_argument('--b', type=int, default=120)
    ap.add_argument('--t', type=int, default=150)
    ap.add_argument('--data', default='data/hopv15.csv')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from ggpm_tpu.cli.common import read_csv_data
    from ggpm_tpu.data.batching import pad_batch, to_model_batch
    from ggpm_tpu.data.vocab_extract import build_vocab
    from ggpm_tpu.graph.mol_graph import tensorize
    from ggpm_tpu.graph.vocab import PairVocab, common_atom_vocab
    from ggpm_tpu.models import decode as dec_mod
    from ggpm_tpu.models.vae import ModelConfig, OPVNet
    from ggpm_tpu.train.loop import init_params_on_cpu

    data = read_csv_data(args.data)
    vocab_rows, _ = build_vocab([r[0] for r in data], 20, ncpu=8)
    vocab = PairVocab([(x, y) for x, y, _ in vocab_rows])
    hv, iv = vocab.size()
    cfg = ModelConfig(hvocab_size=hv, ivocab_size=iv, rnn_type='LSTM',
                      hidden_size=250, embed_size=250, latent_size=24,
                      linear_hidden_size=128, depthT=20, depthG=20,
                      diterT=1, diterG=3, dropout=0.0)
    name = 'hier-prop' if args.family == 'hier' else 'prop-opt'
    model = OPVNet.get_model(name)(cfg=cfg)
    mb0 = tensorize(data[:20], vocab, common_atom_vocab)
    batch0 = jax.tree.map(jnp.asarray,
                          to_model_batch(pad_batch(mb0), vocab.mask,
                                         pad=False))
    params = init_params_on_cpu(model, batch0, jax.random.PRNGKey(0), 0.1)

    B, T = args.b, args.t
    tabs = dec_mod._assm_tables(vocab, common_atom_vocab)
    rv = jnp.zeros((B, 24), jnp.float32)
    u = jnp.full((T, B), 0.5, jnp.float32)
    mask = jnp.asarray(vocab.mask)

    if args.family == 'motif':
        po = jnp.zeros((T, B), jnp.int32)
        fn = lambda p: model.apply(
            p, rv, mask, u, po, po, po, tabs, 5,
            method=lambda m, *a: m._decoder().dec_propose(*a))
    else:
        ke = min(64, 2 * int(np.asarray(tabs['nbond']).max()) + 2)
        fn = lambda p: model.apply(
            p, rv, mask, u, tabs, 5,
            method=lambda m, *a: m._decoder().hdec_propose(
                *a, KE=ke, A=256, Eg=384, NBG=8))

    jx = jax.make_jaxpr(fn)(params)
    bodies = body_counts(jx.jaxpr)
    for depth, c in bodies:
        total = sum(c.values())
        print(f'while body (depth {depth}): {total} primitives')
        for op, n in c.most_common(20):
            print(f'   {op:28s} {n}')


if __name__ == '__main__':
    main()
