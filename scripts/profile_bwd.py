"""Backward-pass decomposition of the canonical b240 training step.

profile_step.py showed fwd = 23 ms but full step = 96 ms; its fwd_bwd probe
returned one grad leaf and XLA DCE'd the rest of the backward.  This script
times value_and_grad with ALL grads kept, per component:

  * encoder-only loss (root+node sums)      -> encoder fwd+bwd
  * decoder-only loss (run_scan output sums) -> decoder fwd+bwd
  * full loss                                -> everything

Writes runs/PROFILE_bwd.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default='data/hopv15.csv')
    ap.add_argument('--batch', type=int, default=240)
    ap.add_argument('--hidden', type=int, default=250)
    ap.add_argument('--latent', type=int, default=24)
    ap.add_argument('--dtype', default='float32')
    ap.add_argument('--remat', action='store_true', default=True)
    ap.add_argument('--no-remat', dest='remat', action='store_false')
    ap.add_argument('--out', default='runs/PROFILE_bwd.json')
    ap.add_argument('--no-tables', action='store_true',
                    help='strip the bgraph transpose tables (A/B the '
                         'scatter-add VJP against the transpose-gather VJP)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ggpm_tpu.cli.common import read_csv_data
    from ggpm_tpu.data.batching import pad_batch
    from ggpm_tpu.data.vocab_extract import build_vocab
    from ggpm_tpu.graph.mol_graph import tensorize
    from ggpm_tpu.graph.vocab import PairVocab, common_atom_vocab
    from ggpm_tpu.models.vae import ModelConfig, PropertyVAE
    from ggpm_tpu.train.loop import Trainer
    from ggpm_tpu.train.optim import make_optimizer

    data = read_csv_data(args.data)
    vocab_rows, _ = build_vocab([r[0] for r in data], 20, ncpu=8)
    vocab = PairVocab([(x, y) for x, y, _ in vocab_rows])
    bs = args.batch
    batch = pad_batch(tensorize(data[:bs], vocab, common_atom_vocab))
    cfg = ModelConfig(hvocab_size=vocab.size()[0], ivocab_size=vocab.size()[1],
                      rnn_type='LSTM', hidden_size=args.hidden,
                      embed_size=args.hidden, latent_size=args.latent,
                      depthT=20, diterT=1, dropout=0.0,
                      compute_dtype=args.dtype, remat=args.remat)
    model = PropertyVAE(cfg=cfg)
    opt = make_optimizer(lr=1e-3, clip_norm=20.0, anneal_rate=0.9,
                         steps_per_epoch=1)
    trainer = Trainer(model, opt, vocab.mask, beta=0.1, print_iter=10 ** 9)
    params, opt_state = trainer.init(batch)
    dev = trainer._device_batch(batch)
    if args.no_tables:
        for lv in ('tree', 'graph'):
            dev[lv] = {k: v for k, v in dev[lv].items()
                       if k not in ('bgraph_t', 'bgraph_tm')}
    rng = jax.random.PRNGKey(0)

    def grad_sum(loss_fn):
        @jax.jit
        def f(params):
            g = jax.grad(loss_fn)(params)
            return sum(jnp.sum(x) for x in jax.tree.leaves(g))
        return f

    def enc_loss(params):
        root, node = model.apply(params, dev['tree'], method='encode')
        return root.sum() + node.sum()

    def dec_loss(params):
        def run(m, b):
            z = jnp.zeros((bs, args.latent))
            t, c, i = m.decoder._run_scan(b['tree'], b['plan'], z, True)
            return t.sum() + c.sum()
        return model.apply(params, dev, method=run)

    def full_loss(params):
        loss, metrics, aux = model.apply(
            params, dev, 0.1, rng, True, False,
            rngs={'dropout': jax.random.fold_in(rng, 1)})
        return loss

    def timeit(fn, *a, n=20):
        out = fn(*a)
        np.asarray(jax.tree.leaves(out)[0])
        best = None
        for _ in range(3):
            t0 = time.time()
            for _ in range(n):
                out = fn(*a)
            np.asarray(jax.tree.leaves(out)[0])
            dt = (time.time() - t0) / n
            best = dt if best is None else min(best, dt)
        return best

    report = {'batch': bs, 'hidden': args.hidden, 'remat': args.remat,
              'ms': {}}
    for name, lf in (('encoder', enc_loss), ('decoder', dec_loss),
                     ('full', full_loss)):
        t_f = timeit(jax.jit(lf), params)
        t_b = timeit(grad_sum(lf), params)
        report['ms'][f'{name}_fwd'] = t_f * 1e3
        report['ms'][f'{name}_fwd_bwd'] = t_b * 1e3
        print(f'{name:8s} fwd {t_f*1e3:7.2f} ms   fwd+bwd {t_b*1e3:7.2f} ms',
              flush=True)

    os.makedirs('runs', exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(report, f, indent=2)
    print('wrote', args.out)


if __name__ == '__main__':
    main()
