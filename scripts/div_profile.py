"""Quantify turbo-decode divergences on the trained HOPV ckpt:
- rounds-to-completion distribution (no cap)
- divergence cause split (no-candidates vs validity-reject vs beam-retry-ok)
- reconstruction vs prior-sample divergence rates
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ggpm_tpu.data.batching import to_model_batch
    from ggpm_tpu.data.vocab_extract import load_vocab_file
    from ggpm_tpu.cli.common import read_csv_data
    from ggpm_tpu.data.dataset import prune_to_vocab
    from ggpm_tpu.graph.mol_graph import tensorize
    from ggpm_tpu.graph.vocab import common_atom_vocab
    from ggpm_tpu.models import decode as dec
    from ggpm_tpu.models.vae import ModelConfig, OPVNet
    from ggpm_tpu.train import checkpoint as ckpt_mod
    from ggpm_tpu.train.loop import init_params_on_cpu

    ckpt = 'runs/QUALITY_hopv.json.ckpt'
    vocab, _ = load_vocab_file(ckpt.replace('.ckpt', '.vocab.txt'))
    cfg = ModelConfig(hvocab_size=vocab.size()[0], ivocab_size=vocab.size()[1],
                      rnn_type='LSTM', hidden_size=250, embed_size=250,
                      latent_size=24, linear_hidden_size=128, depthT=20,
                      depthG=20, diterT=1, diterG=3, dropout=0.0)
    model = OPVNet.get_model('prop-opt')(cfg=cfg)
    data = prune_to_vocab(read_csv_data(
        '/root/reference/data/hopv15/hopv15.csv'), vocab)
    mb0 = tensorize(data[:8], vocab, common_atom_vocab)
    params = init_params_on_cpu(
        model, jax.tree.map(jnp.asarray,
                            to_model_batch(mb0, vocab.mask, pad=False)),
        jax.random.PRNGKey(0), 0.1)
    params = ckpt_mod.load_params(params, ckpt)

    B, T = 120, 150
    kern = dec._get_kernel(dec.MotifDecodeKernel, model, params, vocab.mask, 5)

    # instrument _try_assemble divergence causes
    causes = {'no_cands': 0, 'validity': 0, 'exception': 0}
    orig_get_assm = dec.IncGraph.get_assm_cands
    stats = {'calls': 0, 'empty': 0}

    def traced(self, *a, **k):
        out = orig_get_assm(self, *a, **k)
        stats['calls'] += 1
        if len(out[0]) == 0:
            stats['empty'] += 1
        return out
    dec.IncGraph.get_assm_cands = traced

    def run(z, label):
        rv = jnp.asarray(z)
        u = jnp.full((T, z.shape[0]), 0.5, dtype=jnp.float32)
        pin_op = np.zeros((T, z.shape[0]), dtype=np.int32)
        pin_clab = np.zeros((T, z.shape[0]), dtype=np.int32)
        pins = [[] for _ in range(z.shape[0])]
        pending = list(range(z.shape[0]))
        rounds = 0
        n_div_total = 0
        t0 = time.time()
        per_round = []
        while pending and rounds < 200:
            packed, rc, ri = kern.propose(rv, u, jnp.asarray(pin_op),
                                          jnp.asarray(pin_clab))
            packed = np.asarray(packed)
            rc, ri = np.asarray(rc), np.asarray(ri)
            still = []
            for b in pending:
                status, out = dec._replay_pinned(
                    packed[:, b, :], rc[b], ri[b], pins[b], vocab,
                    common_atom_vocab, 5, 400, 500)
                if status == 'diverge':
                    pins[b] = out
                    for t, (op, clab, _) in enumerate(out):
                        pin_op[t, b] = op
                        pin_clab[t, b] = clab
                    still.append(b)
                    n_div_total += 1
            per_round.append(len(still))
            pending = still
            rounds += 1
        dt = time.time() - t0
        print(f'[{label}] rounds={rounds} total_div={n_div_total} '
              f'time={dt:.1f}s rate={z.shape[0]/dt:.1f}/s '
              f'pending_per_round={per_round[:20]}', flush=True)

    # prior samples
    z = np.random.default_rng(7).standard_normal(
        (B, cfg.latent_size)).astype(np.float32)
    run(z, 'prior')
    print(f'assm calls={stats["calls"]} empty={stats["empty"]}', flush=True)

    # reconstruction latents
    stats['calls'] = stats['empty'] = 0
    mb = tensorize(data[:B], vocab, common_atom_vocab)
    batch = jax.tree.map(jnp.asarray, to_model_batch(mb, vocab.mask, pad=False))
    zr, _ = model.apply(params, batch['tree'],
                        method=lambda m, tree: m.encode_latent(tree,
                                                               perturb=False))
    run(np.asarray(zr), 'recon')
    print(f'assm calls={stats["calls"]} empty={stats["empty"]}', flush=True)


if __name__ == '__main__':
    main()
