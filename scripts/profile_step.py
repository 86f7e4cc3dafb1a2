"""Decompose the canonical-config training step's wall time on TPU.

VERDICT r3 item 1: at canonical b240 f32 the step takes ~98 ms while the
roofline terms account for <20 ms (gathers ~16 ms at HBM speed, matmuls
~4 ms at MXU speed).  This script times the jitted sub-computations
separately to locate the other ~80 ms:

  * encoder forward (depth-20 MPN over the motif graph)
  * decoder scan forward (lax.scan over DFS steps)
  * full loss forward
  * value_and_grad
  * full optimizer step (trainer.step_fn)

and reports per-part seconds plus the plan/tree shapes that drive them.
Writes runs/PROFILE_step.json.  Optionally captures a jax.profiler trace
(--trace DIR).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def timeit(fn, args, n=20, sync=None):
    """Median-of-3 fixed-work timing: call fn n times, one value fetch."""
    import numpy as np
    out = fn(*args)
    leaf = jax_first_leaf(out)
    np.asarray(leaf)  # compile + settle
    best = None
    for _ in range(3):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        np.asarray(jax_first_leaf(out))
        dt = (time.time() - t0) / n
        best = dt if best is None else min(best, dt)
    return best


def jax_first_leaf(tree):
    import jax
    return jax.tree.leaves(tree)[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default='data/hopv15.csv')
    ap.add_argument('--batch', type=int, default=240)
    ap.add_argument('--hidden', type=int, default=250)
    ap.add_argument('--latent', type=int, default=24)
    ap.add_argument('--dtype', default='float32')
    ap.add_argument('--remat', action='store_true', default=True)
    ap.add_argument('--no-remat', dest='remat', action='store_false')
    ap.add_argument('--trace', default=None, help='jax.profiler trace dir')
    ap.add_argument('--out', default='runs/PROFILE_step.json')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ggpm_tpu.cli.common import read_csv_data
    from ggpm_tpu.data.batching import pad_batch
    from ggpm_tpu.data.vocab_extract import build_vocab
    from ggpm_tpu.graph.mol_graph import tensorize
    from ggpm_tpu.graph.vocab import PairVocab, common_atom_vocab
    from ggpm_tpu.models.vae import ModelConfig, PropertyVAE
    from ggpm_tpu.train.loop import Trainer
    from ggpm_tpu.train.optim import make_optimizer

    data = read_csv_data(args.data)
    vocab_rows, _ = build_vocab([r[0] for r in data], 20, ncpu=8)
    vocab = PairVocab([(x, y) for x, y, _ in vocab_rows])

    bs = args.batch
    batch = pad_batch(tensorize(data[:bs], vocab, common_atom_vocab))
    cfg = ModelConfig(hvocab_size=vocab.size()[0], ivocab_size=vocab.size()[1],
                      rnn_type='LSTM', hidden_size=args.hidden,
                      embed_size=args.hidden, latent_size=args.latent,
                      depthT=20, diterT=1, dropout=0.0,
                      compute_dtype=args.dtype, remat=args.remat)
    model = PropertyVAE(cfg=cfg)
    opt = make_optimizer(lr=1e-3, clip_norm=20.0, anneal_rate=0.9,
                         steps_per_epoch=1)
    trainer = Trainer(model, opt, vocab.mask, beta=0.1, print_iter=10 ** 9)
    params, opt_state = trainer.init(batch)
    dev = trainer._device_batch(batch)
    rng = jax.random.PRNGKey(0)

    shapes = {k: {kk: list(getattr(vv, 'shape', ())) for kk, vv in v.items()}
              for k, v in dev.items() if isinstance(v, dict)}
    print('batch shapes:', json.dumps(shapes))

    report = {'batch': bs, 'hidden': args.hidden, 'dtype': args.dtype,
              'remat': args.remat, 'shapes': shapes}

    # --- sub-computations ---------------------------------------------------
    @jax.jit
    def enc_only(params, dev):
        root, node = model.apply(params, dev['tree'], method='encode')
        return root.sum() + node.sum()

    @jax.jit
    def dec_scan_only(params, dev):
        def run(m, batch):
            z = jnp.zeros((bs, args.latent))
            t, c, i = m.decoder._run_scan(batch['tree'], batch['plan'], z, True)
            return t.sum() + c.sum()
        return model.apply(params, dev, method=run)

    @jax.jit
    def fwd_loss(params, dev, rng):
        loss, metrics, aux = model.apply(
            params, dev, 0.1, rng, True, False,
            rngs={'dropout': jax.random.fold_in(rng, 1)})
        return loss

    @jax.jit
    def fwd_bwd(params, dev, rng):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply(p, dev, 0.1, rng, True, False,
                                  rngs={'dropout': jax.random.fold_in(rng, 1)})[0]
        )(params)
        # consume EVERY grad leaf: returning just one lets XLA dead-code-
        # eliminate most of the backward (the round-4 artifact's "51 ms
        # outside autodiff" was mostly this DCE'd backward time —
        # runs/STEP_OVERHEAD_cpu.json: 6.3k HLOs with one leaf consumed
        # vs 12.6k with all)
        return loss, jnp.sqrt(sum(jnp.sum(g * g)
                                  for g in jax.tree.leaves(grads)))

    def full_step(params, opt_state, dev, rng):
        # non-donating wrapper around trainer.step_fn semantics
        return trainer.step_fn(params, opt_state, dev, rng)

    t_enc = timeit(enc_only, (params, dev))
    print(f'encoder fwd        : {t_enc*1e3:8.2f} ms', flush=True)
    t_dec = timeit(dec_scan_only, (params, dev))
    print(f'decoder scan fwd   : {t_dec*1e3:8.2f} ms', flush=True)
    t_fwd = timeit(fwd_loss, (params, dev, rng))
    print(f'full loss fwd      : {t_fwd*1e3:8.2f} ms', flush=True)
    t_bwd = timeit(fwd_bwd, (params, dev, rng))
    print(f'value_and_grad     : {t_bwd*1e3:8.2f} ms', flush=True)

    # full step: re-init params each time is wasteful; time via scan_steps
    # on a size-1 stack to match the product path
    from ggpm_tpu.train.loop import stack_batches
    stacked = stack_batches([dev])
    p2, o2 = trainer.init(batch)
    p2, o2, ms, _ = trainer.scan_steps(p2, o2, stacked)
    np.asarray(jax.tree.leaves(ms)[0])
    n = 20
    t0 = time.time()
    for _ in range(n):
        p2, o2, ms, _ = trainer.scan_steps(p2, o2, stacked)
    np.asarray(jax.tree.leaves(ms)[0])
    t_step = (time.time() - t0) / n
    print(f'full train step    : {t_step*1e3:8.2f} ms', flush=True)

    report['ms'] = {'encoder_fwd': t_enc * 1e3, 'decoder_scan_fwd': t_dec * 1e3,
                    'full_fwd': t_fwd * 1e3, 'fwd_bwd': t_bwd * 1e3,
                    'full_step': t_step * 1e3,
                    'losses_fwd_approx': (t_fwd - t_enc - t_dec) * 1e3,
                    'bwd_approx': (t_bwd - t_fwd) * 1e3,
                    'opt_approx': (t_step - t_bwd) * 1e3}

    if args.trace:
        os.makedirs(args.trace, exist_ok=True)
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                p2, o2, ms, _ = trainer.scan_steps(p2, o2, stacked)
            np.asarray(jax.tree.leaves(ms)[0])
        print('trace written to', args.trace)
        report['trace'] = args.trace

    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(report, f, indent=2)
    print('wrote', args.out)


if __name__ == '__main__':
    main()
