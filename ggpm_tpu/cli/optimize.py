"""Property-guided latent optimization driver
(reference /root/reference/optimize.py).

Encodes, runs soft/patience/hard latent gradient search against the target
HOMO/LUMO values, predicts properties at the optimized code, decodes, and
writes original-vs-optimized CSVs.
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
from ..latent.control import LatentOptimizer
from ..models.decode import decode_hier, decode_motif
from ..train import checkpoint as ckpt
from .common import init_params, read_csv_data, setup_model


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--path-to-config', required=True)
    parser.add_argument('--model-type', default='prop-opt')
    parser.add_argument('--optimize-type', default=None,
                        choices=[None, 'soft', 'patience', 'fixed', 'hard'])
    parser.add_argument('--optim-step', type=int, default=None)
    parser.add_argument('--latent-lr', type=float, default=None)
    parser.add_argument('--property-delta', type=float, default=None)
    parser.add_argument('--patience-threshold', type=float, default=None)
    parser.add_argument('--patience', type=int, default=None)
    parser.add_argument('--batch-size', type=int, default=20)
    parser.add_argument('--fast-decode', action='store_true',
                        help='use the device-resident turbo decode (one '
                             'device call per round instead of per step); '
                             'identical SMILES output, but no per-step '
                             'logs in logs.pkl')
    args = parser.parse_args(argv)

    configs = Configs(path=args.path_to_config)
    # CLI overrides config (reference optimize.py:36-43)
    opt_type = args.optimize_type or configs.get('optimize_type', 'soft')
    opt = dict(
        optimize_type=opt_type,
        latent_lr=args.latent_lr or configs.get('latent_lr', 1.0),
        property_optim_step=args.optim_step or configs.get('property_optim_step', 50),
        property_delta=args.property_delta or configs.get('property_delta', 0.1),
        patience=args.patience or configs.get('patience', 5),
        patience_threshold=args.patience_threshold or configs.get('patience_threshold', 0.1),
    )

    model, vocab, mcfg = setup_model(configs, args.model_type)
    data = read_csv_data(configs.get('test_data') or configs.get('data'))
    dataset = MoleculeDataset(data, vocab, common_atom_vocab, args.batch_size)

    sample = to_model_batch(dataset[0], vocab.mask, pad=False)
    params = init_params(model, jax.tree.map(jnp.asarray, sample))
    params = ckpt.load_params(
        params, configs.get('output_model') or configs.get('saved_model'))

    latent_opt = LatentOptimizer(model, params, **opt)
    is_hier = args.model_type.startswith('hier')
    if args.fast_decode:
        from ..models.decode import decode_best

        def decode_fn(*a, **kw):
            kw['log_steps'] = False
            return decode_best(*a, **kw)
    else:
        decode_fn = decode_hier if is_hier else decode_motif

    recon_rows, prop_rows, logs = [], [], []
    for i in range(len(dataset)):
        mb = dataset[i]
        batch = jax.tree.map(jnp.asarray, to_model_batch(mb, vocab.mask, pad=False))
        if is_hier:
            z, _ = model.apply(
                params, batch['tree'],
                method=lambda m, tree: m.encode_latent(
                    tree, graph=batch['graph'], perturb=False))
        else:
            z, _ = model.apply(
                params, batch['tree'],
                method=lambda m, tree: m.encode_latent(tree, perturb=False))
        h0, l0 = model.apply(params, z,
                             method=lambda m, zz: m.predict_properties(zz))
        z_opt = latent_opt.optimize(z, mb.homos, mb.lumos)
        h1, l1 = model.apply(params, z_opt,
                             method=lambda m, zz: m.predict_properties(zz))
        results, smiles = decode_fn(
            model, params, vocab, common_atom_vocab, np.asarray(z_opt),
            greedy=True, max_decode_step=150)
        logs.extend(results)
        for org, dec, a, b, c, d, ht, lt in zip(
                mb.smiles, smiles, np.asarray(h0), np.asarray(l0),
                np.asarray(h1), np.asarray(l1), mb.homos, mb.lumos):
            recon_rows.append({'original': org, 'reconstructed': dec})
            prop_rows.append({'org_homo': float(a), 'org_lumo': float(b),
                              'new_homo': float(c), 'new_lumo': float(d),
                              'target_homo': float(ht), 'target_lumo': float(lt)})
        print(f'batch {i + 1}/{len(dataset)} done')

    prefix = configs.get('output', f'{opt_type}_optimize')
    prefix = os.path.splitext(prefix)[0]
    pd.DataFrame(recon_rows).to_csv(
        f'reconstructed_molecules_after_{prefix}.csv', index=False)
    pd.DataFrame(prop_rows).to_csv(
        f'property_prediction_after_{prefix}.csv', index=False)
    with open(f'{prefix}_logs.pkl', 'wb') as f:
        pickle.dump(logs, f)
    print(f'wrote {prefix} outputs')


if __name__ == '__main__':
    main()
