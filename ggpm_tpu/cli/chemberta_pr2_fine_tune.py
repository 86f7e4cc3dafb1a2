"""ChemBERTa property-regression baseline CLI
(reference /root/reference/chemberta_pr2_fine_tune.py)."""

from __future__ import annotations

import argparse

from ..configs import Configs
from ..models.chemberta import train_chemberta
from .common import read_csv_data

PROPERTY_MAP = {'homo': 'HOMO', 'lumo': 'LUMO'}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--path-to-config', required=True)
    parser.add_argument('--homo-col', default='homo')
    parser.add_argument('--lumo-col', default='lumo')
    parser.add_argument('--epochs', type=int, default=10)
    parser.add_argument('--batch-size', type=int, default=16)
    args = parser.parse_args(argv)

    configs = Configs(path=args.path_to_config)
    train_data = read_csv_data(configs.get('data'))
    val_path = configs.get('val_data') or configs.get('test_data')
    val_data = read_csv_data(val_path) if val_path else []

    model, params, tok = train_chemberta(
        train_data, val_data,
        epochs=args.epochs, batch_size=args.batch_size,
        lr=configs.get('lr', 1e-4),
        anneal_rate=configs.get('anneal_rate', 0.9),
        patience=configs.get('early_stop_patience', 5))
    print('done')


if __name__ == '__main__':
    main()
