"""Motif-vocabulary extraction CLI (reference /root/reference/get_vocab.py)."""

from __future__ import annotations

import argparse

import pandas as pd

from ..data.vocab_extract import build_vocab, write_vocab


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--data', type=str, required=True)
    parser.add_argument('--output', type=str, default='vocab.txt')
    parser.add_argument('--min_frequency', type=int, default=100)
    parser.add_argument('--ncpu', type=int, default=1)
    args = parser.parse_args(argv)

    if args.data.endswith('.csv'):
        df = pd.read_csv(args.data).dropna(subset=['SMILES'])
        df = df.drop_duplicates(subset=['SMILES']).reset_index(drop=True)
        data = [s.strip() for s in df['SMILES']]
    elif args.data.endswith('.txt'):
        data = [line.strip() for line in open(args.data) if line.strip()]
    else:
        raise TypeError('Data files must be csv or txt')

    rows, fragments = build_vocab(data, args.min_frequency, args.ncpu)
    write_vocab(rows, args.output)
    print(f'wrote {len(rows)} vocab rows ({len(fragments)} frequent fragments) '
          f'to {args.output}')


if __name__ == '__main__':
    main()
