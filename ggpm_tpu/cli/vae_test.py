"""Train-and-periodically-reconstruct harness (reference
/root/reference/vae_test.py:89-136): interleaves training epochs with greedy
reconstruction over a test CSV and prints original/decoded pairs."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import Configs
from ..data.batching import pad_batch, to_model_batch
from ..data.dataset import MoleculeDataset, prune_to_vocab
from ..graph.mol_graph import tensorize
from ..graph.vocab import common_atom_vocab
from ..models.decode import decode_best
from ..train.loop import Trainer
from ..train.optim import make_optimizer
from .common import read_csv_data, setup_model


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--path-to-config', required=True)
    parser.add_argument('--model-type', default='prop')
    parser.add_argument('--recon-every', type=int, default=1)
    parser.add_argument('--recon-count', type=int, default=20)
    args = parser.parse_args(argv)

    configs = Configs(path=args.path_to_config)
    model, vocab, _ = setup_model(configs, args.model_type)
    batch_size = configs.get('batch_size', 20)

    train_data = prune_to_vocab(read_csv_data(configs.get('data')), vocab)
    test_data = read_csv_data(configs.get('test_data') or configs.get('data'))
    test_ds = MoleculeDataset(test_data[:args.recon_count], vocab,
                              common_atom_vocab, batch_size)

    batches = [pad_batch(tensorize(train_data[i:i + batch_size], vocab,
                                   common_atom_vocab))
               for i in range(0, len(train_data) - batch_size + 1, batch_size)]
    optimizer = make_optimizer(lr=configs.get('lr', 1e-3),
                               clip_norm=configs.get('clip_norm', 20.0),
                               anneal_rate=configs.get('anneal_rate', 0.9),
                               steps_per_epoch=len(batches))
    trainer = Trainer(model, optimizer, vocab.mask,
                      beta=configs.get('beta', 0.1),
                      print_iter=configs.get('print_iter', 50))
    params, opt_state = trainer.init(batches[0])

    for epoch in range(configs.get('epoch', 20)):
        params, opt_state, _ = trainer.train_epoch(params, opt_state, batches, epoch)
        if (epoch + 1) % args.recon_every == 0:
            for i in range(len(test_ds)):
                mb = test_ds[i]
                batch = jax.tree.map(jnp.asarray,
                                     to_model_batch(mb, vocab.mask, pad=False))
                z, _ = model.apply(
                    params, batch['tree'],
                    method=lambda m, tree: m.encode_latent(tree, perturb=False))
                _, smiles = decode_best(model, params, vocab,
                                        common_atom_vocab, np.asarray(z),
                                        greedy=True, max_decode_step=150,
                                        log_steps=False)
                for org, dec in zip(mb.smiles, smiles):
                    print(f'org {org} dec {dec}')
    return params


if __name__ == '__main__':
    main()
