"""Profile decode_motif_turbo on the trained HOPV checkpoint: time per
propose round, host replay cost, number of rounds/divergences.

Usage: python scripts/turbo_profile.py [--b 120] [--t 150]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--b', type=int, default=120)
    ap.add_argument('--t', type=int, default=150)
    ap.add_argument('--ckpt', default='runs/QUALITY_hopv.json.ckpt')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ggpm_tpu.data.batching import to_model_batch
    from ggpm_tpu.data.vocab_extract import load_vocab_file
    from ggpm_tpu.cli.common import read_csv_data
    from ggpm_tpu.graph.mol_graph import tensorize
    from ggpm_tpu.graph.vocab import common_atom_vocab
    from ggpm_tpu.models import decode as dec
    from ggpm_tpu.models.vae import ModelConfig, OPVNet
    from ggpm_tpu.train import checkpoint as ckpt_mod
    from ggpm_tpu.train.loop import init_params_on_cpu

    vocab, _ = load_vocab_file(args.ckpt.replace('.ckpt', '.vocab.txt'))
    cfg = ModelConfig(hvocab_size=vocab.size()[0], ivocab_size=vocab.size()[1],
                      rnn_type='LSTM', hidden_size=250, embed_size=250,
                      latent_size=24, linear_hidden_size=128, depthT=20,
                      depthG=20, diterT=1, diterG=3, dropout=0.0)
    model = OPVNet.get_model('prop-opt')(cfg=cfg)
    data = read_csv_data('/root/reference/data/hopv15/hopv15.csv')
    mb0 = tensorize(data[:8], vocab, common_atom_vocab)
    params = init_params_on_cpu(
        model, jax.tree.map(jnp.asarray,
                            to_model_batch(mb0, vocab.mask, pad=False)),
        jax.random.PRNGKey(0), 0.1)
    params = ckpt_mod.load_params(params, args.ckpt)

    B, T = args.b, args.t
    z = np.random.default_rng(7).standard_normal(
        (B, cfg.latent_size)).astype(np.float32)
    kern = dec._get_kernel(dec.MotifDecodeKernel, model, params, vocab.mask, 5)

    rv = jnp.asarray(z)
    u = jnp.full((T, B), 0.5, dtype=jnp.float32)
    pin_op = np.zeros((T, B), dtype=np.int32)
    pin_clab = np.zeros((T, B), dtype=np.int32)

    # warm up compile
    t0 = time.time()
    packed, rc, ri = kern.propose(rv, u, jnp.asarray(pin_op),
                                  jnp.asarray(pin_clab))
    np.asarray(packed)
    print(f'propose compile+run: {time.time()-t0:.2f}s', flush=True)

    # timed propose (cached)
    t0 = time.time()
    packed, rc, ri = kern.propose(rv, u, jnp.asarray(pin_op),
                                  jnp.asarray(pin_clab))
    packed_np = np.asarray(packed)
    rc_np, ri_np = np.asarray(rc), np.asarray(ri)
    t_prop = time.time() - t0
    print(f'propose round (cached): {t_prop:.3f}s '
          f'(fetch {packed_np.nbytes/1e6:.1f} MB)', flush=True)

    # timed replay, all samples
    t0 = time.time()
    n_div = 0
    pins = [[] for _ in range(B)]
    for b in range(B):
        status, out = dec._replay_pinned(packed_np[:, b, :], rc_np[b],
                                         ri_np[b], pins[b], vocab,
                                         common_atom_vocab, 5, 400, 500)
        if status == 'diverge':
            n_div += 1
    t_rep = time.time() - t0
    print(f'replay round 0: {t_rep:.3f}s, diverged {n_div}/{B}', flush=True)

    # full turbo with round counting
    t0 = time.time()
    _, smiles = dec.decode_motif_turbo(model, params, vocab,
                                       common_atom_vocab, z, greedy=True,
                                       max_decode_step=T)
    t_turbo = time.time() - t0
    ok = sum(s is not None for s in smiles)
    print(f'turbo total: {t_turbo:.2f}s = {B/t_turbo:.1f} mols/sec '
          f'({ok}/{B} valid)', flush=True)

    # exact path comparison
    t0 = time.time()
    _, smiles2 = dec.decode_motif(model, params, vocab, common_atom_vocab, z,
                                  greedy=True, max_decode_step=T,
                                  log_steps=False)
    t_exact = time.time() - t0
    print(f'exact total: {t_exact:.2f}s = {B/t_exact:.1f} mols/sec', flush=True)
    print(f'agree: {sum(a==b for a,b in zip(smiles, smiles2))}/{B}', flush=True)


if __name__ == '__main__':
    main()
