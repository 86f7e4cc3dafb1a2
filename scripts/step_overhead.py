"""Decompose the NON-autodiff part of the training step (VERDICT r4 item 4).

At canonical b240 f32, full_step ran ~95.8 ms vs fwd+bwd ~45 ms
(runs/PROFILE_step.json) — ~51 ms/step sits outside autodiff, and the
device trace (runs/TRACE_step.json) shows the step is op-COUNT bound
(~5.9k XLA op executions/step), not bytes- or flops-bound.  This script
pins down where that time goes by compiling and timing step VARIANTS that
add one suspect at a time:

  fwd_bwd        value_and_grad only (the 45 ms baseline)
  +gnorm         ... plus the separate GNorm metric pass
  +opt           ... plus optax update + param add (per-leaf optimizer)
  +opt_flat      ... same but the optimizer runs on ONE flat vector
                 (optax.flatten: tree-of-60-leaves -> 1 concat; adam/clip
                 become ~10 HLOs instead of ~60x10)
  step           the production make_train_step (per-leaf)
  step_flat      production step with the flattened optimizer
  scan8 / scan8_flat   per-step cost inside an 8-step lax.scan (the
                 train_epoch production regime)

Modes: --count (no device: post-fusion HLO instruction counts per variant)
       --time  (fixed-work wall timing on the available backend)

Writes runs/STEP_OVERHEAD.json.
"""

import argparse
import json
import os
import re
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def build(args):
    import jax
    import jax.numpy as jnp
    from ggpm_tpu.cli.common import read_csv_data
    from ggpm_tpu.data.batching import pad_batch
    from ggpm_tpu.data.vocab_extract import build_vocab
    from ggpm_tpu.graph.mol_graph import tensorize
    from ggpm_tpu.graph.vocab import PairVocab, common_atom_vocab
    from ggpm_tpu.models.vae import ModelConfig, PropertyVAE
    from ggpm_tpu.train.loop import Trainer, optax_global_norm
    from ggpm_tpu.train.optim import make_optimizer

    data = read_csv_data(args.data)
    vocab_rows, _ = build_vocab([r[0] for r in data], 20, ncpu=8)
    vocab = PairVocab([(x, y) for x, y, _ in vocab_rows])
    batch = pad_batch(tensorize(data[:args.batch], vocab, common_atom_vocab))
    cfg = ModelConfig(hvocab_size=vocab.size()[0],
                      ivocab_size=vocab.size()[1],
                      rnn_type='LSTM', hidden_size=args.hidden,
                      embed_size=args.hidden, latent_size=args.latent,
                      depthT=20, diterT=1, dropout=0.0,
                      compute_dtype=args.dtype, remat=True)
    model = PropertyVAE(cfg=cfg)
    opt = make_optimizer(1e-3, 20.0, 0.9, 1000, flatten=False)
    opt_flat = make_optimizer(1e-3, 20.0, 0.9, 1000, flatten=True)
    trainer = Trainer(model, opt, vocab.mask, beta=0.1, print_iter=10 ** 9)
    params, opt_state = trainer.init(batch)
    opt_state_flat = opt_flat.init(params)
    dev = trainer._device_batch(batch)
    rng = jax.random.PRNGKey(0)

    def loss_fn(p, b, r):
        loss, metrics, aux = model.apply(
            p, b, 0.1, r, True, False,
            rngs={'dropout': jax.random.fold_in(r, 1)})
        return loss, (metrics, aux)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @jax.jit
    def fwd_bwd(p, b, r):
        (loss, (m, a)), g = grad_fn(p, b, r)
        # consume EVERY grad leaf with ~one op each: returning a single
        # leaf lets XLA dead-code-eliminate most of the backward (the
        # round-4 "51 ms outside autodiff" artifact, STATUS round-5)
        probe = sum(l.reshape(-1)[0] for l in jax.tree.leaves(g))
        return loss, probe

    @jax.jit
    def fwd_bwd_gnorm(p, b, r):
        (loss, (m, a)), g = grad_fn(p, b, r)
        return loss, optax_global_norm(g)

    def make_step(o, donate):
        deco = partial(jax.jit, donate_argnums=(0, 1)) if donate else jax.jit

        @deco
        def step(p, s, b, r):
            r1, r2 = jax.random.split(r)
            (loss, (m, a)), g = grad_fn(p, b, r1)
            upd, s = o.update(g, s, p)
            p = jax.tree.map(lambda x, u: x + u, p, upd)
            m = dict(m, GNorm=optax_global_norm(g))
            return p, s, m, r2
        return step

    def make_step_nometrics(o):
        @partial(jax.jit, donate_argnums=(0, 1))
        def step(p, s, b, r):
            r1, r2 = jax.random.split(r)
            (loss, (m, a)), g = grad_fn(p, b, r1)
            upd, s = o.update(g, s, p)
            p = jax.tree.map(lambda x, u: x + u, p, upd)
            return p, s, loss, r2
        return step

    def make_scan(o, k):
        @partial(jax.jit, donate_argnums=(0, 1))
        def scan(p, s, stacked, r):
            def body(carry, b):
                p, s, r = carry
                r1, r2 = jax.random.split(r)
                (loss, (m, a)), g = grad_fn(p, b, r1)
                upd, s = o.update(g, s, p)
                p = jax.tree.map(lambda x, u: x + u, p, upd)
                m = dict(m, GNorm=optax_global_norm(g))
                return (p, s, r2), m
            (p, s, r), ms = jax.lax.scan(body, (p, s, r), stacked)
            return p, s, ms, r
        return scan

    return dict(model=model, params=params, dev=dev, rng=rng,
                opt=opt, opt_flat=opt_flat, opt_state=opt_state,
                opt_state_flat=opt_state_flat,
                fwd_bwd=fwd_bwd, fwd_bwd_gnorm=fwd_bwd_gnorm,
                make_step=make_step, make_scan=make_scan,
                make_step_nometrics=make_step_nometrics)


_INSTR = re.compile(r'^\s+(?:ROOT\s+)?%?[\w.-]+\s*=\s*\S+\s+(\w+)')


def hlo_counts(lowered):
    compiled = lowered.compile()
    txt = compiled.as_text()
    from collections import Counter
    ops = Counter()
    for line in txt.splitlines():
        m = _INSTR.match(line)
        if m:
            ops[m.group(1)] += 1
    return sum(ops.values()), dict(ops.most_common(12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default='data/hopv15.csv')
    ap.add_argument('--batch', type=int, default=240)
    ap.add_argument('--hidden', type=int, default=250)
    ap.add_argument('--latent', type=int, default=24)
    ap.add_argument('--dtype', default='float32')
    ap.add_argument('--count', action='store_true')
    ap.add_argument('--time', action='store_true')
    ap.add_argument('--scan-k', type=int, default=8)
    ap.add_argument('--out', default='runs/STEP_OVERHEAD.json')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    ctx = build(args)
    report = {'batch': args.batch, 'hidden': args.hidden,
              'dtype': args.dtype,
              'platform': jax.devices()[0].platform}

    p, s, sf = ctx['params'], ctx['opt_state'], ctx['opt_state_flat']
    dev, rng = ctx['dev'], ctx['rng']

    if args.count:
        counts = {}
        counts['fwd_bwd'] = hlo_counts(
            ctx['fwd_bwd'].lower(p, dev, rng))
        counts['fwd_bwd_gnorm'] = hlo_counts(
            ctx['fwd_bwd_gnorm'].lower(p, dev, rng))
        step = ctx['make_step'](ctx['opt'], donate=False)
        counts['step'] = hlo_counts(step.lower(p, s, dev, rng))
        stepf = ctx['make_step'](ctx['opt_flat'], donate=False)
        counts['step_flat'] = hlo_counts(stepf.lower(p, sf, dev, rng))
        for name, (total, top) in counts.items():
            print(f'{name:16s} {total:6d} HLOs  {top}', flush=True)
        report['hlo_counts'] = {k: {'total': v[0], 'by_op': v[1]}
                                for k, v in counts.items()}

    if args.time:
        def timeit(fn, fargs, n=20, donating=False):
            # donating: args 0/1 are donated — thread them through every
            # call (including warmup) and sync on a NON-donated output leaf
            a = tuple(fargs)
            o = fn(*a)
            if donating:
                a = (o[0], o[1]) + a[2:]
                np.asarray(jax.tree.leaves(o[2])[0])
            else:
                np.asarray(jax.tree.leaves(o)[0])
            best = None
            for _ in range(3):
                t0 = time.time()
                for _ in range(n):
                    o = fn(*a)
                    if donating:
                        a = (o[0], o[1]) + a[2:]
                np.asarray(jax.tree.leaves(o[2] if donating else o)[0])
                dt = (time.time() - t0) / n
                best = dt if best is None else min(best, dt)
            return best * 1e3

        ms = {}

        def timed(name, fn, fargs, scale=1.0, **kw):
            # fault-isolate each variant: one backend error (the r5d run
            # died on the FIRST fetch with FailedPrecondition) must not
            # cost the whole artifact
            try:
                ms[name] = timeit(fn, fargs, **kw) / scale
                unit = 'ms/step' if scale != 1.0 else 'ms'
                print(f'{name:16s} {ms[name]:8.2f} {unit}', flush=True)
            except Exception as e:
                ms[name] = None
                ms[name + '_error'] = f'{type(e).__name__}: {e}'[:200]
                print(f'{name:16s} FAILED {ms[name + "_error"]}', flush=True)

        timed('fwd_bwd', ctx['fwd_bwd'], (p, dev, rng))
        timed('fwd_bwd_gnorm', ctx['fwd_bwd_gnorm'], (p, dev, rng))

        for name, o, st in (('step', ctx['opt'], s),
                            ('step_flat', ctx['opt_flat'], sf)):
            step = ctx['make_step'](o, donate=True)
            pp = jax.tree.map(jnp.copy, p)
            ss = jax.tree.map(jnp.copy, st)
            timed(name, step, (pp, ss, dev, rng), donating=True)

        for name, o, st in (('step_nometrics', ctx['opt'], s),):
            step = ctx['make_step_nometrics'](o)
            pp = jax.tree.map(jnp.copy, p)
            ss = jax.tree.map(jnp.copy, st)
            timed(name, step, (pp, ss, dev, rng), donating=True)

        k = args.scan_k
        stacked = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (k,) + x.shape), dev)
        for name, o, st in (('scan8', ctx['opt'], s),
                            ('scan8_flat', ctx['opt_flat'], sf)):
            scan = ctx['make_scan'](o, k)
            pp = jax.tree.map(jnp.copy, p)
            ss = jax.tree.map(jnp.copy, st)
            timed(name, scan, (pp, ss, stacked, rng), n=5,
                  donating=True, scale=float(k))
        report['ms'] = ms

    os.makedirs('runs', exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(report, f, indent=2)
    print('wrote', args.out)


if __name__ == '__main__':
    main()
