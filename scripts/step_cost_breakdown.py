"""Attribute training-step matmul FLOPs and gather/scatter HBM bytes to
model sections (encoder depth loops vs the teacher-forcing decoder scan vs
everything else) straight from the step jaxpr — no device needed.

The decoder scan executes every PADDED (step, sample) slot, so its share of
the step cost times the measured slot utilisation (plan.active.mean over the
padded [T, B] grid) bounds what scan-length-sorted batching can recover.

Usage: JAX_PLATFORMS=cpu python scripts/step_cost_breakdown.py [--batch 240]
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def eqn_costs(jaxpr, mul=1.0):
    """Yield (scan_length_path, flops, bytes) leaf costs."""
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        params = eqn.params or {}
        if prim == 'dot_general':
            (lc, _), _ = params['dimension_numbers']
            lhs = eqn.invars[0].aval
            out = eqn.outvars[0].aval
            k = 1
            for d in lc:
                k *= lhs.shape[d]
            yield ((), 2 * math.prod(out.shape) * k * mul, 0.0)
        elif prim == 'gather':
            out = eqn.outvars[0].aval
            yield ((), 0.0, out.size * out.dtype.itemsize * mul)
        elif prim.startswith('scatter'):
            upd = eqn.invars[-1].aval
            yield ((), 0.0, upd.size * upd.dtype.itemsize * 2 * mul)
        elif prim == 'scan':
            ln = params['length']
            for path, f, b in eqn_costs(params['jaxpr'].jaxpr, mul * ln):
                yield ((ln,) + path, f, b)
        elif prim == 'while':
            for path, f, b in eqn_costs(params['body_jaxpr'].jaxpr, mul):
                yield (('w',) + path, f, b)
        elif 'branches' in params:
            # count the max branch once (cond)
            best = None
            for br in params['branches']:
                items = list(eqn_costs(br.jaxpr, mul))
                tot = sum(f for _, f, _ in items) + sum(b for _, _, b in items)
                if best is None or tot > best[0]:
                    best = (tot, items)
            if best:
                for path, f, b in best[1]:
                    yield (('c',) + path, f, b)
        else:
            for pname in ('jaxpr', 'call_jaxpr', 'fun_jaxpr'):
                sub = params.get(pname)
                if sub is not None:
                    yield from eqn_costs(getattr(sub, 'jaxpr', sub), mul)
                    break


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default='/root/reference/data/hopv15/hopv15.csv')
    ap.add_argument('--batch', type=int, default=240)
    ap.add_argument('--hidden', type=int, default=250)
    ap.add_argument('--latent', type=int, default=24)
    ap.add_argument('--remat', action='store_true')
    args = ap.parse_args()

    import jax
    from collections import defaultdict
    from ggpm_tpu.cli.common import read_csv_data
    from ggpm_tpu.data.batching import pad_batch
    from ggpm_tpu.data.vocab_extract import build_vocab
    from ggpm_tpu.graph.mol_graph import tensorize
    from ggpm_tpu.graph.vocab import PairVocab, common_atom_vocab
    from ggpm_tpu.models.vae import ModelConfig, PropertyVAE
    from ggpm_tpu.train.loop import Trainer
    from ggpm_tpu.train.optim import make_optimizer

    data = read_csv_data(args.data)
    vocab_rows, _ = build_vocab([r[0] for r in data], 20, ncpu=1)
    vocab = PairVocab([(x, y) for x, y, _ in vocab_rows])

    bs = args.batch
    mb = tensorize(data[:bs], vocab, common_atom_vocab)
    pb = pad_batch(mb)
    util = float(pb.plan.active.mean())
    T = pb.plan.active.shape[0]
    print(f'batch {bs}: decoder scan T={T}, slot utilisation '
          f'{util:.2f} (active fraction of the padded [T, B] grid)')

    cfg = ModelConfig(hvocab_size=vocab.size()[0], ivocab_size=vocab.size()[1],
                      rnn_type='LSTM', hidden_size=args.hidden,
                      embed_size=args.hidden, latent_size=args.latent,
                      depthT=20, diterT=1, dropout=0.0, remat=args.remat)
    model = PropertyVAE(cfg=cfg)
    opt = make_optimizer(lr=1e-3, clip_norm=20.0, anneal_rate=0.9,
                         steps_per_epoch=1)
    trainer = Trainer(model, opt, vocab.mask, beta=0.1, print_iter=10 ** 9)
    params, opt_state = trainer.init(pb)
    dev = trainer._device_batch(pb)
    rng = jax.random.PRNGKey(0)
    jx = jax.make_jaxpr(lambda p, o, b, r: trainer.step_fn(p, o, b, r))(
        params, opt_state, dev, rng)

    flops_by = defaultdict(float)
    bytes_by = defaultdict(float)
    for path, f, b in eqn_costs(jx.jaxpr):
        # classify by the outermost scan length on the path
        lens = [x for x in path if isinstance(x, int)]
        if lens and lens[0] == T:
            key = f'decoder scan (len {T})'
        elif lens:
            key = f'loop len {lens[0]}'
        else:
            key = 'top level'
        flops_by[key] += f
        bytes_by[key] += b

    tf = sum(flops_by.values())
    tb = sum(bytes_by.values())
    print(f'total matmul flops/step: {tf:.3e}   gather/scatter bytes/step: '
          f'{tb:.3e}')
    for key in sorted(set(flops_by) | set(bytes_by),
                      key=lambda k: -(flops_by[k] + bytes_by[k])):
        print(f'  {key:26s} flops {flops_by[key]:.3e} ({flops_by[key]/max(tf,1e-9):5.1%})'
              f'   bytes {bytes_by[key]:.3e} ({bytes_by[key]/max(tb,1e-9):5.1%})')
    print(f'\ndecoder-scan waste bound: (1 - util) x decoder share = '
          f'{(1-util):.2f} of the decoder rows above')


if __name__ == '__main__':
    main()
