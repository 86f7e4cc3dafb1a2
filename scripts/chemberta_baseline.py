"""ChemBERTa property-regression baseline artifact (VERDICT r4 item 9).

Trains the from-scratch flax ChemBERTa backbone (models/chemberta.py; the
pretrained HF weights are offline-unavailable, which the artifact records)
on a HOPV15 split and reports holdout HOMO/LUMO MAE — the reference's
baseline table row (reference chemberta_pr2_fine_tune.py:91-193).  The VAE
property heads are expected to win; this is the comparison row the
reference uses ChemBERTa for.  Writes runs/CHEMBERTA_hopv.json.
"""

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default='data/hopv15.csv')
    ap.add_argument('--holdout', type=int, default=60)
    ap.add_argument('--epochs', type=int, default=80)
    ap.add_argument('--batch-size', type=int, default=16)
    ap.add_argument('--lr', type=float, default=1e-4)
    ap.add_argument('--out', default='runs/CHEMBERTA_hopv.json')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ggpm_tpu.cli.common import read_csv_data
    from ggpm_tpu.models.chemberta import train_chemberta

    data = [r for r in read_csv_data(args.data)
            if r[1] is not None and r[2] is not None]
    random.Random(1).shuffle(data)
    # 3-way split: early stopping watches VAL, the reported MAE is on the
    # untouched TEST holdout (the reference early-stops on a separate
    # val_data config, chemberta_pr2_fine_tune.py:97,181-183)
    test, rest = data[:args.holdout], data[args.holdout:]
    n_val = max(len(rest) // 6, 16)
    val, train = rest[:n_val], rest[n_val:]
    print(f'{len(train)} train / {len(val)} val / {len(test)} test',
          flush=True)

    t0 = time.time()
    model, params, tok = train_chemberta(
        train, val, epochs=args.epochs, batch_size=args.batch_size,
        lr=args.lr)
    train_s = time.time() - t0

    toks = tok.encode_batch([r[0] for r in test], 256)
    _, metrics = model.apply(params, jnp.asarray(toks),
                             jnp.asarray([r[1] for r in test],
                                         dtype=jnp.float32),
                             jnp.asarray([r[2] for r in test],
                                         dtype=jnp.float32), True)
    hmean = float(np.mean([r[1] for r in train]))
    lmean = float(np.mean([r[2] for r in train]))
    report = {
        'dataset': args.data, 'n_train': len(train), 'n_test': len(test),
        'epochs': args.epochs,
        'HOMO_MAE': round(float(metrics['homo_mae']), 4),
        'LUMO_MAE': round(float(metrics['lumo_mae']), 4),
        'mean_baseline': {
            'HOMO_MAE': round(float(np.mean(
                [abs(r[1] - hmean) for r in test])), 4),
            'LUMO_MAE': round(float(np.mean(
                [abs(r[2] - lmean) for r in test])), 4)},
        'train_seconds': round(train_s, 1),
        'platform': jax.devices()[0].platform,
        'note': 'from-scratch backbone — the pretrained RoBERTa weights the '
                'reference fine-tunes (seyonec/ChemBERTa) are offline-'
                'unavailable; load_pretrained_backbone accepts them when '
                'supplied',
    }
    with open(args.out, 'w') as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=1), flush=True)


if __name__ == '__main__':
    main()
