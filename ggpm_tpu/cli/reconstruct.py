"""Reconstruction inference driver (reference /root/reference/reconstruct.py).

Encodes each test molecule without latent noise, decodes greedily, and writes
a CSV of original vs reconstructed SMILES (+ predicted HOMO/LUMO when the
model has property heads), plus a pickle of per-step decode logs.
"""

from __future__ import annotations

import argparse
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..configs import Configs
from ..data.batching import to_model_batch
from ..data.dataset import MoleculeDataset
from ..graph.vocab import common_atom_vocab
from ..models.decode import decode_hier, decode_motif
from ..train import checkpoint as ckpt
from .common import init_params, read_csv_data, setup_model


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--path-to-config', required=True)
    parser.add_argument('--model-type', default='prop')
    parser.add_argument('--batch-size', type=int, default=20)
    parser.add_argument('--max-decode-step', type=int, default=150)
    parser.add_argument('--fast-decode', action='store_true',
                        help='use the device-resident turbo decode (one '
                             'device call per round instead of per step); '
                             'identical SMILES output, but no per-step '
                             'logs in logs.pkl')
    args = parser.parse_args(argv)

    configs = Configs(path=args.path_to_config)
    model, vocab, mcfg = setup_model(configs, args.model_type)

    data = read_csv_data(configs.get('test_data') or configs.get('data'))
    dataset = MoleculeDataset(data, vocab, common_atom_vocab, args.batch_size)

    sample = to_model_batch(dataset[0], vocab.mask, pad=False)
    params = init_params(model, jax.tree.map(jnp.asarray, sample))
    model_path = configs.get('output_model') or configs.get('saved_model')
    params = ckpt.load_params(params, model_path)

    has_props = args.model_type in ('prop-opt', 'hier-prop-opt')
    is_hier = args.model_type.startswith('hier')
    if args.fast_decode:
        from ..models.decode import decode_best

        def decode_fn(*a, **kw):
            kw['log_steps'] = False
            return decode_best(*a, **kw)
    else:
        decode_fn = decode_hier if is_hier else decode_motif
    rows, logs = [], []
    for i in range(len(dataset)):
        mb = dataset[i]
        batch = jax.tree.map(jnp.asarray, to_model_batch(mb, vocab.mask, pad=False))
        if is_hier:
            z, _ = model.apply(
                params, batch['tree'],
                method=lambda m, tree: m.encode_latent(
                    tree, graph=batch['graph'], perturb=False))
        else:
            z, _ = model.apply(params, batch['tree'],
                               method=lambda m, tree: m.encode_latent(tree, perturb=False))
        if has_props:
            homo_p, lumo_p = model.apply(
                params, z, method=lambda m, zz: m.predict_properties(zz))
            homo_p, lumo_p = np.asarray(homo_p), np.asarray(lumo_p)
        else:
            homo_p = lumo_p = [None] * len(mb.smiles)
        results, smiles = decode_fn(
            model, params, vocab, common_atom_vocab, np.asarray(z),
            greedy=True, max_decode_step=args.max_decode_step)
        logs.extend(results)
        for org, dec, h, l in zip(mb.smiles, smiles, homo_p, lumo_p):
            rows.append({'original': org, 'reconstructed': dec,
                         'HOMO': None if h is None else float(h),
                         'LUMO': None if l is None else float(l)})
        print(f'batch {i + 1}/{len(dataset)} done')

    out = configs.get('output', 'reconstructions.csv')
    pd.DataFrame(rows).to_csv(out, index=False)
    with open(os.path.splitext(out)[0] + '_logs.pkl', 'wb') as f:
        pickle.dump(logs, f)
    print(f'wrote {out}')
    return rows


if __name__ == '__main__':
    main()
