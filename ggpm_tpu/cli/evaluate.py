"""Evaluation CLI: MOSES-style metrics over a reconstruction CSV
(reference /root/reference/evaluate.py + evaluation/metrics.py)."""

from __future__ import annotations

import argparse
import json

import pandas as pd

from ..eval.metrics import Metrics


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--reconstructions', required=True,
                        help='CSV with original/reconstructed columns')
    parser.add_argument('--k', type=int, default=None)
    parser.add_argument('--fcd-ckpt', default=None,
                        help='ChemNet checkpoint (eval.chemnet format); '
                             'enables real FCD')
    args = parser.parse_args(argv)

    df = pd.read_csv(args.reconstructions)
    gen = [None if pd.isna(x) else x for x in df['reconstructed']]
    ref = [x for x in df['original'] if isinstance(x, str)]

    metrics = Metrics(fcd_ckpt=args.fcd_ckpt).get_recon_n_sample_metrics(
        gen, ref, args.k)
    # exact-reconstruction rate
    from ..chem import canon_smiles
    matches = sum(1 for o, d in zip(df['original'], gen)
                  if isinstance(o, str) and d and canon_smiles(o) == canon_smiles(d))
    metrics['recon_accuracy'] = matches / max(len(gen), 1)
    print(json.dumps(metrics, indent=2, default=float))
    return metrics


if __name__ == '__main__':
    main()
