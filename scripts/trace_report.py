"""Summarize ANY captured jax.profiler xplane trace directory.

Reuses trace_step.parse_xspace (dynamic xplane schema) and prints the
device lines, per-category totals, and the top ops — for analyzing decode
/ propose traces (e.g. runs/hier_trace from hier_propose_tpu.py --trace)
with the same accounting the train-step trace artifact used.

Usage: python scripts/trace_report.py <trace_dir> [--out runs/X.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from trace_step import _category, parse_xspace  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('trace_dir')
    ap.add_argument('--line', default=None,
                    help='device line to attribute ops from (default: the '
                         'line named "XLA Ops", else the busiest)')
    ap.add_argument('--top', type=int, default=25)
    ap.add_argument('--out', default=None)
    args = ap.parse_args()

    data = parse_xspace(args.trace_dir)
    print('device lines:')
    for k, v in data['lines'].items():
        print(f"  {k}: span {v['span_ms']:.1f} ms, busy {v['busy_ms']:.1f} "
              f"ms, {v['events']} events")

    lines = {ln for (ln, _) in data['per_op']}
    line = args.line
    if line is None:
        line = next((ln for ln in lines if ln == 'XLA Ops'), None)
    if line is None and lines:
        line = max(lines, key=lambda ln: sum(
            ms for (l2, _), (ms, _) in data['per_op'].items() if l2 == ln))
    ops = {name: v for (ln, name), v in data['per_op'].items() if ln == line}

    by_cat = {}
    for name, (ms, n) in ops.items():
        c = _category(name)
        d = by_cat.setdefault(c, [0.0, 0])
        d[0] += ms
        d[1] += n
    print(f'\nper-category totals on line "{line}":')
    for c, (ms, n) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        print(f'  {c:10s} {ms:10.2f} ms  {n:8d} events')

    print(f'\ntop {args.top} ops:')
    top = sorted(ops.items(), key=lambda kv: -kv[1][0])[:args.top]
    for name, (ms, n) in top:
        print(f'  {ms:9.2f} ms x{n:6d}  {_category(name):9s} {name[:120]}')

    if args.out:
        json.dump({
            'lines': data['lines'],
            'line': line,
            'by_category': {c: {'total_ms': round(ms, 3), 'n': n}
                            for c, (ms, n) in by_cat.items()},
            'top_ops': [{'op': name, 'category': _category(name),
                         'total_ms': round(ms, 3), 'occurrences': n}
                        for name, (ms, n) in top],
        }, open(args.out, 'w'), indent=2)
        print('wrote', args.out)


if __name__ == '__main__':
    main()
