"""Capture a jax.profiler device trace of the canonical training step and
distill it into a committed JSON artifact (runs/TRACE_step.json): top ops by
self time + category totals.  This is the machine-level accounting VERDICT r3
item 1 asks for: WHICH resource binds the b240 step.

Usage:
    python scripts/trace_step.py [--batch 240] [--steps 10] [--dtype float32]
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def parse_xspace(trace_dir):
    """Extract per-op self times from the captured xplane protobuf via
    tensorboard_plugin_profile's converter (framework_op_stats tool)."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data
    paths = glob.glob(os.path.join(trace_dir, '**', '*.xplane.pb'),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f'no xplane.pb under {trace_dir}')
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        paths, 'framework_op_stats^', {'tqx': 'out:csv'})
    return data


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default='data/hopv15.csv')
    ap.add_argument('--batch', type=int, default=240)
    ap.add_argument('--hidden', type=int, default=250)
    ap.add_argument('--latent', type=int, default=24)
    ap.add_argument('--dtype', default='float32')
    ap.add_argument('--steps', type=int, default=10)
    ap.add_argument('--no-tables', action='store_true')
    ap.add_argument('--trace-dir', default='runs/trace_step')
    ap.add_argument('--out', default='runs/TRACE_step.json')
    args = ap.parse_args()

    import jax
    import numpy as np

    from ggpm_tpu.cli.common import read_csv_data
    from ggpm_tpu.data.batching import pad_batch
    from ggpm_tpu.data.vocab_extract import build_vocab
    from ggpm_tpu.graph.mol_graph import tensorize
    from ggpm_tpu.graph.vocab import PairVocab, common_atom_vocab
    from ggpm_tpu.models.vae import ModelConfig, PropertyVAE
    from ggpm_tpu.train.loop import Trainer, device_sync
    from ggpm_tpu.train.optim import make_optimizer

    data = read_csv_data(args.data)
    vocab_rows, _ = build_vocab([r[0] for r in data], 20, ncpu=8)
    vocab = PairVocab([(x, y) for x, y, _ in vocab_rows])
    bs = args.batch
    batch = pad_batch(tensorize(data[:bs], vocab, common_atom_vocab))
    cfg = ModelConfig(hvocab_size=vocab.size()[0],
                      ivocab_size=vocab.size()[1],
                      rnn_type='LSTM', hidden_size=args.hidden,
                      embed_size=args.hidden, latent_size=args.latent,
                      depthT=20, diterT=1, dropout=0.0,
                      compute_dtype=args.dtype, remat=True)
    model = PropertyVAE(cfg=cfg)
    opt = make_optimizer(lr=1e-3, clip_norm=20.0, anneal_rate=0.9,
                         steps_per_epoch=1)
    trainer = Trainer(model, opt, vocab.mask, beta=0.1, print_iter=10 ** 9)
    params, opt_state = trainer.init(batch)
    dev = trainer._device_batch(batch)
    if args.no_tables:
        for lv in ('tree', 'graph'):
            dev[lv] = {k: v for k, v in dev[lv].items()
                       if k not in ('bgraph_t', 'bgraph_tm')}

    # warm up / compile
    params, opt_state, metrics, _ = trainer.train_step(params, opt_state, dev)
    device_sync(metrics)

    os.makedirs(args.trace_dir, exist_ok=True)
    t0 = time.time()
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.steps):
            params, opt_state, metrics, _ = trainer.train_step(
                params, opt_state, dev)
        device_sync(metrics)
    wall = (time.time() - t0) / args.steps
    print(f'{args.steps} steps traced, {wall*1e3:.1f} ms/step', flush=True)

    csv_data = parse_xspace(args.trace_dir)
    import csv as _csv
    import io
    rows = list(_csv.DictReader(io.StringIO(
        csv_data if isinstance(csv_data, str) else csv_data.decode())))
    # normalise: keep device ops with self time
    def f(r, k, d=0.0):
        try:
            return float(r.get(k, d) or d)
        except ValueError:
            return d
    ops = []
    for r in rows:
        name = r.get('Operation') or r.get('Op name') or r.get('Type', '?')
        ops.append({
            'op': name,
            'category': r.get('Type', r.get('Category', '?')),
            'total_self_ms': f(r, 'Total self-time (us)') / 1e3,
            'avg_self_us': f(r, 'Avg. self-time (us)'),
            'occurrences': int(f(r, '#Occurrences')),
            'flop_rate': f(r, 'GFLOPs/sec'),
            'mem_bw_gbps': f(r, 'Memory BW (GB/s)'),
        })
    ops.sort(key=lambda o: -o['total_self_ms'])
    by_cat = {}
    for o in ops:
        c = by_cat.setdefault(o['category'], {'total_self_ms': 0.0, 'n': 0})
        c['total_self_ms'] += o['total_self_ms']
        c['n'] += o['occurrences']
    report = {
        'batch': bs, 'hidden': args.hidden, 'dtype': args.dtype,
        'steps': args.steps, 'ms_per_step_wall': wall * 1e3,
        'tables': not args.no_tables,
        'platform': jax.devices()[0].platform,
        'by_category': {k: dict(v, total_self_ms=round(v['total_self_ms'], 3))
                        for k, v in sorted(by_cat.items(),
                                           key=lambda kv: -kv[1]['total_self_ms'])},
        'top_ops': ops[:40],
    }
    with open(args.out, 'w') as fp:
        json.dump(report, fp, indent=2)
    print('wrote', args.out)
    for k, v in list(report['by_category'].items())[:12]:
        print(f"{k:32s} {v['total_self_ms']:10.2f} ms  ({v['n']} ops)")


if __name__ == '__main__':
    main()
