"""Quickstart: the full GGPM-TPU workflow on a small dataset in one script.

    python examples/quickstart.py [--data /path/to/data.csv]

Steps: vocabulary → tensorize → train (prop-opt) → reconstruct →
prior sampling → latent property optimization → metrics.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default='data/chem_data/train.csv')
    ap.add_argument('--epochs', type=int, default=60)
    args = ap.parse_args()

    import numpy as np

    from ggpm_tpu.chem import canon_smiles
    from ggpm_tpu.cli.common import read_csv_data
    from ggpm_tpu.data.batching import pad_batch
    from ggpm_tpu.data.vocab_extract import build_vocab
    from ggpm_tpu.eval.metrics import Metrics
    from ggpm_tpu.graph.mol_graph import tensorize
    from ggpm_tpu.graph.vocab import PairVocab, common_atom_vocab
    from ggpm_tpu.models.api import optimize_recs, reconstruct, sample
    from ggpm_tpu.models.vae import ModelConfig, PropOptVAE
    from ggpm_tpu.train.loop import Trainer
    from ggpm_tpu.train.optim import make_optimizer

    # 1. data + vocabulary
    data = read_csv_data(args.data)[:60]
    vocab_rows, _ = build_vocab([r[0] for r in data], min_frequency=4)
    vocab = PairVocab([(x, y) for x, y, _ in vocab_rows])
    print(f'{len(data)} molecules, vocab {vocab.size()}')

    # 2. tensorize
    batches = [pad_batch(tensorize(data[i:i + 10], vocab, common_atom_vocab))
               for i in range(0, len(data) - 9, 10)]

    # 3. train
    cfg = ModelConfig(hvocab_size=vocab.size()[0], ivocab_size=vocab.size()[1],
                      hidden_size=128, embed_size=128, latent_size=24,
                      depthT=8, diterT=1)
    model = PropOptVAE(cfg=cfg)
    opt = make_optimizer(lr=2e-3, anneal_rate=0.99,
                         steps_per_epoch=len(batches))
    trainer = Trainer(model, opt, vocab.mask, beta=0.05, print_iter=100)
    params, opt_state = trainer.init(batches[0])
    for epoch in range(args.epochs):
        params, opt_state, _ = trainer.train_epoch(params, opt_state, batches)
    print('train metrics:', {k: round(v, 3) for k, v in
                             trainer.evaluate(params, batches).items()})

    # 4. reconstruct
    props, (results, decoded) = reconstruct(model, params, batches[0], vocab,
                                            max_decode_step=80)
    hits = sum(1 for o, d in zip(batches[0].smiles, decoded)
               if d and canon_smiles(o) == canon_smiles(d))
    print(f'reconstruction: {hits}/{len(decoded)} exact; '
          f'HOMO preds: {np.round(props[0][:3], 2) if props else None}')

    # 5. sample from the prior
    _, sampled = sample(model, params, vocab, 8, max_decode_step=60,
                        log_steps=False)
    print('samples:', [s for s in sampled if s][:4])

    # 6. latent property optimization
    (h, l), (_, optimized) = optimize_recs(
        model, params, batches[0], vocab, optimize_type='hard',
        latent_lr=0.05, property_optim_step=20)
    print('optimized HOMO preds:', np.round(h[:4], 2))

    # 7. metrics
    m = Metrics().get_recon_n_sample_metrics(decoded, batches[0].smiles)
    print('metrics:', {k: (round(v, 3) if isinstance(v, float) else v)
                       for k, v in m.items()})


if __name__ == '__main__':
    main()
