"""Time the MOTIF turbo decode's pieces on the real TPU (sibling of
hier_propose_tpu.py).

The motif family is the product default (`prop`/`prop-opt`); bench decodes
it pipelined at B=120 x 4 chunks.  This script isolates warm propose
execution, host replay, and end-to-end turbo time on ONE batch, and can
capture an xplane trace of the warm propose for scripts/trace_report.py —
the data the >=400 mols/sec push needs (VERDICT r4 item 7).

Usage: python scripts/motif_propose_tpu.py [--b 120] [--t 150]
Writes runs/MOTIF_PROPOSE_TPU.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--b', type=int, default=120)
    ap.add_argument('--t', type=int, default=150)
    ap.add_argument('--ckpt', default='runs/QUALITY_hopv.json.ckpt')
    ap.add_argument('--data', default='data/hopv15.csv')
    ap.add_argument('--out', default='runs/MOTIF_PROPOSE_TPU.json')
    ap.add_argument('--trace', default=None,
                    help='capture an xplane trace of one warm propose')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ggpm_tpu.cli.common import read_csv_data
    from ggpm_tpu.data.batching import pad_batch, to_model_batch
    from ggpm_tpu.data.dataset import prune_to_vocab
    from ggpm_tpu.data.vocab_extract import load_vocab_file
    from ggpm_tpu.graph.mol_graph import tensorize
    from ggpm_tpu.graph.vocab import common_atom_vocab
    from ggpm_tpu.models import decode as dec_mod
    from ggpm_tpu.models.vae import ModelConfig, OPVNet
    from ggpm_tpu.train import checkpoint as ckpt_mod
    from ggpm_tpu.train.loop import init_params_on_cpu

    vocab, _ = load_vocab_file(args.ckpt.replace('.ckpt', '.vocab.txt'))
    hv, iv = vocab.size()
    cfg = ModelConfig(hvocab_size=hv, ivocab_size=iv, rnn_type='LSTM',
                      hidden_size=250, embed_size=250, latent_size=24,
                      linear_hidden_size=128, depthT=20, depthG=20,
                      diterT=1, diterG=3, dropout=0.0)
    model = OPVNet.get_model('prop-opt')(cfg=cfg)
    data = prune_to_vocab(read_csv_data(args.data), vocab)[:20]
    mb0 = tensorize(data, vocab, common_atom_vocab)
    batch0 = jax.tree.map(jnp.asarray,
                          to_model_batch(pad_batch(mb0), vocab.mask,
                                         pad=False))
    params = init_params_on_cpu(model, batch0, jax.random.PRNGKey(0), 0.1)
    params = ckpt_mod.load_params(params, args.ckpt)

    B, T = args.b, args.t
    tabs = dec_mod._assm_tables(vocab, common_atom_vocab)
    kern = dec_mod._get_kernel(dec_mod.MotifDecodeKernel, model, params,
                               vocab.mask, 5)
    rv = np.random.default_rng(11).standard_normal((B, 24)).astype(
        np.float32)
    u = jnp.full((T, B), 0.5, dtype=jnp.float32)
    po = jnp.zeros((T, B), jnp.int32)
    report = {'b': B, 't': T,
              'platform': jax.devices()[0].platform}

    def sync(out):
        # a true sync must FETCH a value (see train.loop.device_sync)
        np.asarray(out[1])

    t0 = time.time()
    out = kern.propose(jnp.asarray(rv), u, po, po, po, tabs)
    sync(out)
    report['propose_first_call_s'] = round(time.time() - t0, 1)
    t0 = time.time()
    out = kern.propose(jnp.asarray(rv), u, po, po, po, tabs)
    sync(out)
    report['propose_warm_s'] = round(time.time() - t0, 2)
    if args.trace:
        os.makedirs(args.trace, exist_ok=True)
        with jax.profiler.trace(args.trace):
            out = kern.propose(jnp.asarray(rv), u, po, po, po, tabs)
            sync(out)
        report['trace'] = args.trace

    # --- end-to-end turbo: one-shot batch and the bench's 4-chunk pipe ---
    t0 = time.time()
    _, smiles = dec_mod.decode_motif_turbo(model, params, vocab,
                                           common_atom_vocab, rv,
                                           greedy=True, max_decode_step=T,
                                           log_steps=False)
    e2e = time.time() - t0
    report['turbo_e2e_s'] = round(e2e, 2)
    report['turbo_mols_per_sec'] = round(B / e2e, 2)
    report['valid_frac'] = round(
        sum(s is not None for s in smiles) / B, 3)

    rv4 = np.random.default_rng(12).standard_normal((4 * B, 24)).astype(
        np.float32)
    _ = dec_mod.decode_motif_turbo(model, params, vocab, common_atom_vocab,
                                   rv4[:B], greedy=True, max_decode_step=T,
                                   log_steps=False, chunk=B)  # warm chunk
    t0 = time.time()
    _, smiles4 = dec_mod.decode_motif_turbo(model, params, vocab,
                                            common_atom_vocab, rv4,
                                            greedy=True, max_decode_step=T,
                                            log_steps=False, chunk=B)
    e2e4 = time.time() - t0
    report['pipelined_4x_e2e_s'] = round(e2e4, 2)
    report['pipelined_4x_mols_per_sec'] = round(4 * B / e2e4, 2)
    report['pipelined_valid_frac'] = round(
        sum(s is not None for s in smiles4) / (4 * B), 3)

    with open(args.out, 'w') as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=1), flush=True)


if __name__ == '__main__':
    main()
