"""Training-regime benchmark: throughput + MFU across batch size, model
size, and compute precision.

Round-1's 18k mols/sec headline was measured at the reference's batch 20 —
a dispatch-latency-bound regime that says nothing about TPU utilisation
(hidden 700 ran as fast as hidden 250).  This script measures the scaled
regime: canonical (hidden 250) and MotifG2G_Large (hidden 700, latent 48,
thesis §4.2.1) at batch 20 and large batch, in f32 and bf16, reporting

* steady-state training molecules/sec,
* analytic matmul FLOPs per step from the step jaxpr,
* MFU against the v5e single-chip peak FOR THE RUN'S DTYPE: 197 TFLOP/s
  bf16; f32 matmuls run as multi-pass bf16 on the MXU at ≈half the bf16
  rate, so f32 rows score against 98.5 TFLOP/s (scoring them against the
  bf16 peak understated f32 MFU ~2× — VERDICT r2 item).

Writes runs/MFU.json and prints a table.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

V5E_PEAK_FLOPS = {'bfloat16': 197e12, 'float32': 98.5e12}  # one chip
V5E_HBM_BW = 820e9       # bytes/sec, one v5e chip


def count_matmul_flops(jaxpr) -> float:
    """Sum 2·M·N·K over every dot_general in a jaxpr, recursing into scan
    bodies (× trip count), pjit/remat calls, and cond branches (max).

    XLA's ``cost_analysis()['flops']`` counts gathers/elementwise as flops
    and overcounts this model by ~10× (MFU > 1); the MXU roofline only
    cares about matmul flops."""
    import math
    total = 0.0
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
            total += 2 * math.prod(out.shape) * k
        elif prim == 'scan':
            total += count_matmul_flops(params['jaxpr'].jaxpr) \
                * params['length']
        elif prim == 'while':
            # no while_loops on the training path; count one iteration
            total += count_matmul_flops(params['body_jaxpr'].jaxpr)
        elif 'branches' in params:
            total += max(count_matmul_flops(b.jaxpr)
                         for b in params['branches'])
        else:
            for pname in ('jaxpr', 'call_jaxpr', 'fun_jaxpr'):
                sub = params.get(pname)
                if sub is not None:
                    total += count_matmul_flops(getattr(sub, 'jaxpr', sub))
                    break
    return total


def count_gather_bytes(jaxpr) -> float:
    """HBM bytes moved by gather/scatter row traffic (output side), the
    roofline-limiting term of the MPN depth loop (docs/MPN_ROOFLINE.md:
    after the algebraic restructure the loop is gather-bandwidth-bound,
    so MBU over this term — not MFU — is the utilisation number that can
    approach 1.0).  Matmul/elementwise traffic is excluded: XLA fuses most
    of it, and the gathers cannot fuse."""
    total = 0.0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        params = eqn.params or {}
        if prim == 'gather':
            out = eqn.outvars[0].aval
            total += out.size * out.dtype.itemsize
        elif prim.startswith('scatter'):
            upd = eqn.invars[-1].aval    # update rows read + written back
            total += upd.size * upd.dtype.itemsize * 2
        elif prim == 'scan':
            total += count_gather_bytes(params['jaxpr'].jaxpr) \
                * params['length']
        elif prim == 'while':
            total += count_gather_bytes(params['body_jaxpr'].jaxpr)
        elif 'branches' in params:
            total += max(count_gather_bytes(b.jaxpr)
                         for b in params['branches'])
        else:
            for pname in ('jaxpr', 'call_jaxpr', 'fun_jaxpr'):
                sub = params.get(pname)
                if sub is not None:
                    total += count_gather_bytes(getattr(sub, 'jaxpr', sub))
                    break
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default='data/hopv15.csv')
    ap.add_argument('--seconds', type=float, default=10.0)
    ap.add_argument('--out', default='runs/MFU.json')
    ap.add_argument('--flatten', action='store_true',
                    help='run the optimizer on one ravelled vector '
                         '(optax.flatten) — A/B for the op-count-bound '
                         'step (see train/optim.make_optimizer)')
    ap.add_argument('--quick', action='store_true',
                    help='canonical f32 b20 only (smoke test)')
    args = ap.parse_args()

    import jax
    import numpy as np

    from collections import Counter
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

    def make_batches(bs):
        out = []
        for i in range(0, len(data) - bs + 1, bs):
            try:
                out.append(pad_batch(tensorize(data[i:i + bs], vocab,
                                               common_atom_vocab)))
            except Exception:
                pass
        return out

    # (name, hidden, latent, dtype, batch, remat) — the scan backward
    # holds every step's residuals, so large-batch rows rematerialise the
    # decoder scan (29.6G HBM demand at b240 without it)
    combos = [('canonical', 250, 24, 'float32', 20, False)]
    if not args.quick:
        combos += [
            ('canonical', 250, 24, 'float32', 240, True),
            ('canonical', 250, 24, 'bfloat16', 240, True),
            ('large', 700, 48, 'float32', 20, False),
            ('large', 700, 48, 'float32', 240, True),
            ('large', 700, 48, 'bfloat16', 240, True),
        ]

    batch_cache = {}
    rows = []

    def run_combo(name, hidden, latent, dtype, bs, remat):
        if bs not in batch_cache:
            batch_cache[bs] = make_batches(bs)
        batches = batch_cache[bs]
        if not batches:
            print(f'{name} b{bs}: no batches, skipped')
            return
        cfg = ModelConfig(hvocab_size=vocab.size()[0],
                          ivocab_size=vocab.size()[1], rnn_type='LSTM',
                          hidden_size=hidden, embed_size=hidden,
                          latent_size=latent, depthT=20, diterT=1,
                          dropout=0.0, compute_dtype=dtype, remat=remat)
        model = PropertyVAE(cfg=cfg)
        opt = make_optimizer(lr=1e-3, clip_norm=20.0, anneal_rate=0.9,
                             steps_per_epoch=max(len(batches), 1),
                             flatten=args.flatten)
        trainer = Trainer(model, opt, vocab.mask, beta=0.1,
                          print_iter=10 ** 9)
        params, opt_state = trainer.init(batches[0])
        # dominant DEVICE-batch signature (every leaf must match to stack)
        all_dev = [trainer._device_batch(mb) for mb in batches]
        dev_sig = lambda db: tuple(getattr(l, 'shape', ())
                                   for l in jax.tree.leaves(db))
        common, _ = Counter(dev_sig(db) for db in all_dev).most_common(1)[0]
        dev = [db for db in all_dev if dev_sig(db) == common]

        # matmul FLOPs per optimizer step from the step jaxpr (MXU
        # roofline; see count_matmul_flops for why not cost_analysis)
        flops = None
        gbytes = None
        try:
            rng = jax.random.PRNGKey(0)
            jx = jax.make_jaxpr(
                lambda p, o, b, r: trainer.step_fn(p, o, b, r))(
                params, opt_state, dev[0], rng)
            flops = count_matmul_flops(jx.jaxpr)
            gbytes = count_gather_bytes(jx.jaxpr)
        except Exception as e:
            print('flop count unavailable:', e)

        # the whole epoch runs as ONE lax.scan device call (bit-identical
        # to sequential steps) so the measurement is compute-bound.
        # Amortization fix (round 5): at b240 the 350-molecule set yields
        # ONE batch, so k=1 made every call a single step paying full
        # dispatch overhead while b20 amortized over k=14 — replicate the
        # batch list to k>=8 (repeated data changes nothing about per-step
        # cost; params/opt-state still evolve every step)
        from ggpm_tpu.train.loop import device_sync, stack_batches
        while len(dev) < 8:
            dev = dev + dev[:8 - len(dev)]
        stacked = stack_batches(dev)
        k = len(dev)
        for _ in range(2):
            params, opt_state, ms, _ = trainer.scan_steps(params, opt_state,
                                                          stacked)
            device_sync(ms)

        # fixed-work measurement with ONE final sync (see bench.py: a
        # sync per call measures the relay round-trip, not the TPU)
        n_calls = max(int(args.seconds), 2)
        n_steps = 0
        t0 = time.time()
        for _ in range(n_calls):
            params, opt_state, ms, _ = trainer.scan_steps(params, opt_state,
                                                          stacked)
            n_steps += k
        device_sync(ms)
        dt = time.time() - t0
        steps_sec = n_steps / dt
        mols_sec = steps_sec * bs
        peak = V5E_PEAK_FLOPS[dtype]
        mfu = (flops * steps_sec / peak) if flops else None
        mbu = (gbytes * steps_sec / V5E_HBM_BW) if gbytes else None
        row = {'config': name, 'hidden': hidden, 'dtype': dtype, 'batch': bs,
               'steps_per_sec': round(steps_sec, 2),
               'mols_per_sec': round(mols_sec, 1),
               'flops_per_step': flops, 'peak_flops': peak,
               'mfu': round(mfu, 4) if mfu is not None else None,
               'gather_bytes_per_step': gbytes,
               'mbu_gather': round(mbu, 4) if mbu is not None else None}
        rows.append(row)
        print(row, flush=True)

    for combo in combos:
        try:
            run_combo(*combo)
        except Exception as e:
            # one combo's compile failure (device OOM, relay flake) must
            # not lose the other rows
            print(f'{combo[0]} b{combo[4]} {combo[3]}: FAILED '
                  f'{type(e).__name__}: {str(e)[:200]}', flush=True)
            rows.append({'config': combo[0], 'hidden': combo[1],
                         'dtype': combo[3], 'batch': combo[4],
                         'error': str(e)[:200]})

    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump({'peak_flops_by_dtype': V5E_PEAK_FLOPS, 'rows': rows}, f, indent=2)
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
