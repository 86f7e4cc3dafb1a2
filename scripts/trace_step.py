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


_XPLANE_DESCRIPTOR_SET = ('/opt/venv/lib/python3.12/site-packages/tensorflow/'
                          'include/tsl/profiler/protobuf/'
                          'xplane_proto-descriptor-set.proto.bin')


def parse_xspace(trace_dir):
    """Decode the captured xplane protobuf and return per-op totals from the
    device plane's XLA-ops line.

    tensorboard_plugin_profile's converter is version-mismatched against the
    installed TF (no ``xspace_to_tools_data`` symbol), so the xplane schema
    is loaded dynamically from the descriptor-set binary TF ships and the
    event tree walked directly.  Events on one XLine are non-overlapping
    leaf executions, so summing durations per metadata name is exact op
    accounting; device idle = line span − Σ durations."""
    from google.protobuf import (descriptor_pb2, descriptor_pool,
                                 message_factory)
    paths = glob.glob(os.path.join(trace_dir, '**', '*.xplane.pb'),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f'no xplane.pb under {trace_dir}')
    fds = descriptor_pb2.FileDescriptorSet.FromString(
        open(_XPLANE_DESCRIPTOR_SET, 'rb').read())
    pool = descriptor_pool.DescriptorPool()
    for f in fds.file:
        pool.Add(f)
    XSpace = message_factory.GetMessageClass(
        pool.FindMessageTypeByName('tensorflow.profiler.XSpace'))
    xspace = XSpace.FromString(open(sorted(paths)[-1], 'rb').read())

    device_planes = [p for p in xspace.planes
                     if p.name.startswith('/device:')]
    out = {'planes': [p.name for p in xspace.planes], 'lines': {}}
    per_op = {}
    busy_span = {}
    for plane in device_planes:
        emeta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            key = f'{plane.name}::{line.name}'
            t0, t1, busy = None, None, 0
            for ev in line.events:
                name = emeta.get(ev.metadata_id, str(ev.metadata_id))
                d = per_op.setdefault((line.name, name), [0.0, 0])
                d[0] += ev.duration_ps / 1e9      # ps → ms
                d[1] += 1
                s, e = ev.offset_ps, ev.offset_ps + ev.duration_ps
                t0 = s if t0 is None else min(t0, s)
                t1 = e if t1 is None else max(t1, e)
                busy += ev.duration_ps
            if t0 is not None:
                out['lines'][key] = {
                    'span_ms': (t1 - t0) / 1e9,
                    'busy_ms': busy / 1e9,
                    'events': len(line.events),
                }
    out['per_op'] = per_op
    return out


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
    ap.add_argument('--parse-only', action='store_true',
                    help='distill an already-captured trace dir (skips the '
                         'model run; wall ms comes from --wall-ms)')
    ap.add_argument('--wall-ms', type=float, default=None)
    ap.add_argument('--platform', default=None)
    args = ap.parse_args()

    if args.parse_only:
        _distill(args, args.wall_ms, args.platform or 'tpu')
        return

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

    _distill(args, wall * 1e3, jax.devices()[0].platform)


def _category(op_name: str) -> str:
    """Coarse op category from the XLA op name (fusions are named after
    their root instruction)."""
    n = op_name.lower()
    for tag, cat in (('dot', 'matmul'), ('conv', 'matmul'),
                     ('scatter', 'scatter'), ('gather', 'gather'),
                     ('dynamic-slice', 'gather'),
                     ('dynamic-update-slice', 'scatter'),
                     ('all-reduce', 'collective'), ('copy', 'copy'),
                     ('transpose', 'copy'), ('convert', 'convert'),
                     ('reduce', 'reduce'), ('sort', 'sort'),
                     ('rng', 'rng'), ('iota', 'elementwise'),
                     ('select', 'elementwise'), ('broadcast', 'elementwise'),
                     ('compare', 'elementwise'), ('add', 'elementwise'),
                     ('mul', 'elementwise'), ('tanh', 'elementwise'),
                     ('logistic', 'elementwise'), ('exp', 'elementwise')):
        if tag in n:
            return cat
    if n.startswith(('fusion', 'loop_', 'input_', 'output_', 'wide.')):
        return 'fusion-other'
    return 'other'


def _distill(args, wall_ms, platform):
    space = parse_xspace(args.trace_dir)
    ops = []
    for (line, name), (ms, n) in space['per_op'].items():
        ops.append({'line': line, 'op': name, 'category': _category(name),
                    'total_ms': round(ms, 3), 'occurrences': n,
                    'avg_us': round(ms / max(n, 1) * 1e3, 1)})
    # the XLA-ops line carries the leaf executions; other lines (modules,
    # steps) are containers — report ops from the busiest line only
    line_tot = {}
    for o in ops:
        line_tot[o['line']] = line_tot.get(o['line'], 0.0) + o['total_ms']
    op_line = max(line_tot, key=line_tot.get) if line_tot else None
    leaf = sorted((o for o in ops if o['line'] == op_line),
                  key=lambda o: -o['total_ms'])
    by_cat = {}
    for o in leaf:
        c = by_cat.setdefault(o['category'], {'total_ms': 0.0, 'n': 0})
        c['total_ms'] += o['total_ms']
        c['n'] += o['occurrences']
    report = {
        'batch': args.batch, 'hidden': args.hidden, 'dtype': args.dtype,
        'steps': args.steps, 'ms_per_step_wall': wall_ms,
        'tables': not args.no_tables,
        'platform': platform,
        'lines': space['lines'],
        'op_line': op_line,
        'by_category': {k: dict(v, total_ms=round(v['total_ms'], 3))
                        for k, v in sorted(by_cat.items(),
                                           key=lambda kv: -kv[1]['total_ms'])},
        'top_ops': leaf[:48],
    }
    with open(args.out, 'w') as fp:
        json.dump(report, fp, indent=2)
    print('wrote', args.out)
    for k, v in space['lines'].items():
        print(f"{k}: span {v['span_ms']:.1f} ms, busy {v['busy_ms']:.1f} ms, "
              f"{v['events']} events")
    for k, v in list(report['by_category'].items())[:12]:
        print(f"{k:16s} {v['total_ms']:10.2f} ms  ({v['n']} events)")


if __name__ == '__main__':
    main()
