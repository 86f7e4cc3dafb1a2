"""Property fine-tuning driver with early stopping and the negative-loss
circuit breaker (reference /root/reference/vae_fine_tune.py).

Also covers per-subnetwork optimizers (``--indv-opt``, reference
vae_fine_tune_indv_opt.py:61-70).
"""

from __future__ import annotations

import argparse
import os

from ..configs import Configs
from ..data.batching import pad_batch
from ..data.dataset import prune_to_vocab
from ..graph.mol_graph import tensorize
from ..graph.vocab import common_atom_vocab
from ..train import checkpoint as ckpt
from ..train.loop import Trainer
from ..train.optim import default_group_fn, make_multi_optimizer, make_optimizer
from .common import maybe_load_pretrained, read_csv_data, setup_model


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--path-to-config', required=True)
    parser.add_argument('--model-type', default=None,
                        help='defaults to configs.model_finetune_type or prop-opt')
    parser.add_argument('--indv-opt', action='store_true',
                        help='per-subnetwork optimizers (encoder/decoder/homo/lumo)')
    args = parser.parse_args(argv)

    configs = Configs(path=args.path_to_config)
    model_type = args.model_type or configs.get('model_finetune_type', 'prop-opt')
    model, vocab, mcfg = setup_model(configs, model_type)
    configs.to_json(os.path.join(configs.save_dir, 'configs.json'))

    batch_size = configs.get('batch_size', 20)
    train_data = prune_to_vocab(read_csv_data(configs.get('data')), vocab)
    val_path = configs.get('val_data') or configs.get('test_data')
    val_data = prune_to_vocab(read_csv_data(val_path), vocab) if val_path else []

    def to_batches(data):
        batches = [data[i:i + batch_size]
                   for i in range(0, len(data), batch_size)]
        return [pad_batch(tensorize(b, vocab, common_atom_vocab))
                for b in batches if len(b) == batch_size]

    train_batches = to_batches(train_data)
    val_batches = to_batches(val_data)
    steps_per_epoch = max(len(train_batches), 1)

    if args.indv_opt:
        lrs = {'encoder': configs.get('encoder_lr', configs.get('lr', 1e-3)),
               'decoder': configs.get('decoder_lr', configs.get('lr', 1e-3)),
               'homo': configs.get('homo_lr', configs.get('lr', 1e-3)),
               'lumo': configs.get('lumo_lr', configs.get('lr', 1e-3))}
        optimizer = make_multi_optimizer(
            default_group_fn, lrs, clip_norm=configs.get('clip_norm', 20.0),
            anneal_rate=configs.get('anneal_rate', 0.9),
            steps_per_epoch=steps_per_epoch)
    else:
        optimizer = make_optimizer(
            lr=configs.get('lr', 1e-3), clip_norm=configs.get('clip_norm', 20.0),
            anneal_rate=configs.get('anneal_rate', 0.9),
            steps_per_epoch=steps_per_epoch)

    trainer = Trainer(model, optimizer, vocab.mask,
                      beta=configs.get('beta', 0.1),
                      print_iter=configs.get('print_iter', 50),
                      save_dir=configs.save_dir,
                      save_iter=configs.get('save_iter', -1),
                      clip_break_count=configs.get('clip_break_count', 5),
                      seed=configs.get('seed', 1))
    params, opt_state = trainer.init(train_batches[0])
    params, _ = maybe_load_pretrained(
        params, configs, model, vocab, trainer._device_batch(train_batches[0]))

    early = ckpt.EarlyStopping(
        patience=configs.get('early_stop_patience', 5), verbose=True,
        path=os.path.join(configs.save_dir, 'model.best'))

    # in-epoch validation cadence (reference vae_fine_tune.py:121-148
    # validates every eval_iter steps); default = once per epoch
    eval_iter = configs.get('eval_iter', None) or len(train_batches)
    chunks = [train_batches[i:i + eval_iter]
              for i in range(0, len(train_batches), eval_iter)]

    stop = False
    for epoch in range(configs.get('epoch', 20)):
        for chunk in chunks:
            params, opt_state, broke = trainer.train_epoch(
                params, opt_state, chunk, epoch)
            if broke:
                print('Negative-loss circuit breaker tripped; stopping.')
                stop = True
                break
            if val_batches:
                val = trainer.evaluate(params, val_batches)
                print(f'[epoch {epoch} step {trainer.total_step}] val ' +
                      ', '.join(f'{k}: {v:.3f}' for k, v in sorted(val.items())))
                early(val['Loss'], params)
                if early.early_stop:
                    print('Early stopping.')
                    stop = True
                    break
        if stop:
            break
        ckpt.save_params(params, os.path.join(configs.save_dir, f'model.{epoch}'))
    return params


if __name__ == '__main__':
    main()
