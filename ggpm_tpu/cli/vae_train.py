"""Pretraining driver (reference /root/reference/vae_train.py).

Usage:
    python -m ggpm_tpu.cli.vae_train --path-to-config configs.json \
        --model-type prop [--data-csv data.csv | --data shards_dir]

Either streams preprocessed pickle shards (``configs.data`` directory, like
the reference DataFolder path) or tensorizes a CSV on the fly.
"""

from __future__ import annotations

import argparse
import os

from ..configs import Configs
from ..data.batching import pad_batch
from ..data.dataset import DataFolder, prune_to_vocab
from ..graph.mol_graph import tensorize
from ..graph.vocab import common_atom_vocab
from ..train import checkpoint as ckpt
from ..train.loop import Trainer
from ..train.optim import make_optimizer
from .common import maybe_load_pretrained, read_csv_data, setup_model


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--path-to-config', required=True)
    parser.add_argument('--model-type', required=True)
    parser.add_argument('--data-csv', default=None,
                        help='tensorize this CSV instead of reading shards')
    parser.add_argument('--n-devices', type=int, default=0,
                        help='data-parallel training over an n-device mesh '
                             '(0 = auto: all available devices if >1; 1 = '
                             'force single-device). Each optimizer step '
                             'consumes n batches, gradient-psum over ICI.')
    parser.add_argument('--dist-coordinator', default=None,
                        help='multi-host: coordinator address host:port '
                             '(or env GGPM_COORDINATOR); one JAX process '
                             'per host, each reading a disjoint data shard')
    parser.add_argument('--dist-nprocs', type=int, default=None,
                        help='multi-host: total process count '
                             '(or env GGPM_NUM_PROCESSES)')
    parser.add_argument('--dist-pid', type=int, default=None,
                        help='multi-host: this process index '
                             '(or env GGPM_PROCESS_ID)')
    parser.add_argument('--tp', type=int, default=1,
                        help='model-axis extent: with --tp T > 1 the mesh '
                             'is 2-D (data=n/T × model=T) and vocab-dim '
                             'parameters (motif/attachment embeddings, '
                             'cls/icls heads) + their optimizer moments '
                             'are sharded over the model axis via GSPMD')
    args = parser.parse_args(argv)

    # multi-host: join the cluster BEFORE any other jax use; after this,
    # jax.devices() is the global list and psums span hosts
    from ..parallel.distributed import init_distributed
    proc_id = init_distributed(args.dist_coordinator, args.dist_nprocs,
                               args.dist_pid)
    import jax
    n_proc = jax.process_count()

    configs = Configs(path=args.path_to_config)
    model, vocab, mcfg = setup_model(configs, args.model_type)
    if proc_id == 0:
        configs.to_json(os.path.join(configs.save_dir, 'configs.json'))

    batch_size = configs.get('batch_size', 20)

    def data_epoch():
        # each process consumes a disjoint shard of the input (multi-host
        # input pipeline over DCN; a no-op at n_proc == 1)
        if args.data_csv:
            data = prune_to_vocab(read_csv_data(args.data_csv), vocab)
            batches = [data[i:i + batch_size]
                       for i in range(0, len(data), batch_size)]
            for b in batches[proc_id::n_proc]:
                if len(b) == batch_size:
                    yield pad_batch(tensorize(b, vocab, common_atom_vocab))
        else:
            yield from DataFolder(configs.data, batch_size,
                                  num_shards=n_proc, shard_index=proc_id)

    first = next(iter(data_epoch()))
    steps_per_epoch = max(
        sum(1 for _ in data_epoch()) if args.data_csv else 1000, 1)

    optimizer = make_optimizer(
        lr=configs.get('lr', 1e-3), clip_norm=configs.get('clip_norm', 20.0),
        anneal_rate=configs.get('anneal_rate', 0.9),
        steps_per_epoch=steps_per_epoch)
    n_dev = args.n_devices if args.n_devices > 0 else len(jax.devices())
    if n_proc > 1:
        n_dev = len(jax.devices())    # global mesh is mandatory multi-host
    mesh = None
    if n_dev > 1 and args.tp > 1:
        from ..parallel.mesh import make_mesh_2d
        assert n_dev % args.tp == 0, (n_dev, args.tp)
        mesh = make_mesh_2d(n_dev // args.tp, args.tp)
        print(f'dp={n_dev // args.tp} × tp={args.tp} GSPMD over {n_dev} '
              f'devices ({mesh.devices.flat[0].platform})')
    elif n_dev > 1:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(n_dev)
        print(f'data-parallel over {n_dev} devices '
              f'({mesh.devices.flat[0].platform})')
    trainer = Trainer(model, optimizer, vocab.mask,
                      beta=configs.get('beta', 0.1),
                      print_iter=(configs.get('print_iter', 50)
                                  if proc_id == 0 else 10 ** 9),
                      save_dir=configs.save_dir if proc_id == 0 else None,
                      save_iter=configs.get('save_iter', -1),
                      seed=configs.get('seed', 1), mesh=mesh,
                      tp_min_dim=configs.get('tp_min_dim', 256))
    params, opt_state = trainer.init(first)
    params, loaded = maybe_load_pretrained(
        params, configs, model, vocab, trainer._device_batch(first))

    load_epoch = configs.get('load_epoch', -1)
    if load_epoch >= 0:
        params = ckpt.load_params(
            params, os.path.join(configs.save_dir, f'model.{load_epoch}'))

    n_params = sum(x.size for x in __import__('jax').tree.leaves(params))
    print('Model #Params: %dK' % (n_params / 1000,))

    for epoch in range(load_epoch + 1, configs.get('epoch', 20)):
        params, opt_state, stop = trainer.train_epoch(
            params, opt_state, data_epoch(), epoch)
        if configs.get('save_iter', -1) == -1 and proc_id == 0:
            ckpt.save_params(params,
                             os.path.join(configs.save_dir, f'model.{epoch}'))
        if stop:
            break
    return params


if __name__ == '__main__':
    main()
