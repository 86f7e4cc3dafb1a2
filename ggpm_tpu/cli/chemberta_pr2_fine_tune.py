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
    parser.add_argument('--pretrained-dir', default=None,
                        help='local checkpoint dir (native save_chemberta '
                             'output or a HF Flax RoBERTa flax_model.msgpack)')
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
        patience=configs.get('early_stop_patience', 5),
        pretrained_dir=args.pretrained_dir or configs.get('pretrained_dir'))
    out_prefix = configs.get('save_dir')
    if out_prefix:
        from ..models.chemberta import save_chemberta
        import os
        os.makedirs(out_prefix, exist_ok=True)
        save_chemberta(os.path.join(out_prefix, 'chemberta'), params, tok)
    print('done')


if __name__ == '__main__':
    main()
