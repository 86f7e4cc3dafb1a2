"""Dump encoder latent vectors for a molecule set (the role of the
reference's ``Scripts/hg2g/geth.py`` latent-dump helper)."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import Configs
from ..data.batching import to_model_batch
from ..data.dataset import MoleculeDataset
from ..graph.vocab import common_atom_vocab
from ..train import checkpoint as ckpt
from .common import init_params, read_csv_data, setup_model


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--path-to-config', required=True)
    parser.add_argument('--model-type', default='prop')
    parser.add_argument('--output', default='latents.npy')
    parser.add_argument('--batch-size', type=int, default=20)
    args = parser.parse_args(argv)

    configs = Configs(path=args.path_to_config)
    model, vocab, _ = setup_model(configs, args.model_type)
    data = read_csv_data(configs.get('test_data') or configs.get('data'))
    dataset = MoleculeDataset(data, vocab, common_atom_vocab, args.batch_size)

    sample = to_model_batch(dataset[0], vocab.mask, pad=False)
    params = init_params(model, jax.tree.map(jnp.asarray, sample))
    params = ckpt.load_params(
        params, configs.get('output_model') or configs.get('saved_model'))

    is_hier = args.model_type.startswith('hier')
    zs, smiles = [], []
    for i in range(len(dataset)):
        mb = dataset[i]
        batch = jax.tree.map(jnp.asarray,
                             to_model_batch(mb, vocab.mask, pad=False))
        if is_hier:
            z, _ = model.apply(params, batch['tree'],
                               method=lambda m, tree: m.encode_latent(
                                   tree, graph=batch['graph'], perturb=False))
        else:
            z, _ = model.apply(params, batch['tree'],
                               method=lambda m, tree: m.encode_latent(
                                   tree, perturb=False))
        zs.append(np.asarray(z))
        smiles += mb.smiles
    np.save(args.output, np.concatenate(zs, axis=0))
    with open(args.output + '.smiles.txt', 'w') as f:
        f.write('\n'.join(smiles))
    print(f'wrote {sum(z.shape[0] for z in zs)} latents to {args.output}')


if __name__ == '__main__':
    main()
