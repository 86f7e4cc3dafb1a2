"""Time the hier turbo decode's pieces on the real TPU.

The first TPU bench with a hier phase blew a 1800s timeout; runs/
PROPOSE_COST.json says one 120-mol propose call is 7 GB / 63 GFLOP —
seconds at hardware speed — so this script separates compile time, propose
execution, host replay, and the exact-path fallback share to find where
the minutes actually go.

Usage: python scripts/hier_propose_tpu.py [--b 120] [--t 150]
Writes runs/HIER_PROPOSE_TPU.json.
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
    ap.add_argument('--ckpt', default='runs/QUALITY_hier_hopv.json.ckpt')
    ap.add_argument('--data', default='data/hopv15.csv')
    ap.add_argument('--out', default='runs/HIER_PROPOSE_TPU.json')
    ap.add_argument('--a-budget', type=int, default=256)
    ap.add_argument('--eg-budget', type=int, default=384)
    ap.add_argument('--nbg-budget', type=int, default=8)
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
                      diterT=1, diterG=3, dropout=0.0, remat=True)
    model = OPVNet.get_model('hier-prop')(cfg=cfg)
    data = prune_to_vocab(read_csv_data(args.data), vocab)[:20]
    mb0 = tensorize(data, vocab, common_atom_vocab)
    batch0 = jax.tree.map(jnp.asarray,
                          to_model_batch(pad_batch(mb0), vocab.mask,
                                         pad=False))
    params = init_params_on_cpu(model, batch0, jax.random.PRNGKey(0), 0.1)
    params = ckpt_mod.load_params(params, args.ckpt)

    B, T = args.b, args.t
    tabs = dec_mod._assm_tables(vocab, common_atom_vocab)
    ke = min(64, 2 * int(np.asarray(tabs['nbond']).max()) + 2)
    kern = dec_mod._get_kernel(dec_mod.HierDecodeKernel, model, params,
                               vocab.mask, 5, ke, args.a_budget,
                               args.eg_budget, args.nbg_budget)
    rv = np.random.default_rng(11).standard_normal((B, 24)).astype(
        np.float32)
    u = jnp.full((T, B), 0.5, dtype=jnp.float32)
    report = {'b': B, 't': T, 'ke': ke, 'a_budget': args.a_budget,
              'eg_budget': args.eg_budget, 'nbg_budget': args.nbg_budget,
              'platform': jax.devices()[0].platform}

    def sync(out):
        # jax.block_until_ready is NON-FUNCTIONAL in this environment
        # (see train.loop.device_sync) — a true sync must FETCH a value.
        # The round-4 artifacts' propose_warm_s: 0.01 only timed the async
        # dispatch; the "unaccounted" e2e seconds were the scan itself.
        np.asarray(out[3])

    # --- propose: compile vs warm execution ---------------------------
    t0 = time.time()
    out = kern.propose(jnp.asarray(rv), u, tabs)
    sync(out)
    report['propose_first_call_s'] = round(time.time() - t0, 1)
    t0 = time.time()
    out = kern.propose(jnp.asarray(rv), u, tabs)
    sync(out)
    report['propose_warm_s'] = round(time.time() - t0, 2)
    if args.trace:
        os.makedirs(args.trace, exist_ok=True)
        with jax.profiler.trace(args.trace):
            out = kern.propose(jnp.asarray(rv), u, tabs)
            sync(out)
        report['trace'] = args.trace
    packed, root_cls, root_icls, poisoned = out
    report['poisoned_frac'] = round(float(np.asarray(poisoned).mean()), 3)

    # --- host replay share --------------------------------------------
    packed_h = np.asarray(packed)
    rc_h = np.asarray(root_cls)
    ri_h = np.asarray(root_icls)
    po_h = np.asarray(poisoned)
    t0 = time.time()
    n_done = n_div = 0
    for j in range(B):
        if po_h[j]:
            continue
        status, _ = dec_mod._replay_hier(packed_h[:, j, :], rc_h[j],
                                         ri_h[j], vocab,
                                         common_atom_vocab, 5, 400, 500)
        if status == 'done':
            n_done += 1
        else:
            n_div += 1
    report['replay_s'] = round(time.time() - t0, 2)
    report['replay_done'] = n_done
    report['replay_diverged'] = n_div
    n_fallback = int(po_h.sum()) + n_div
    report['fallback_count'] = n_fallback

    # --- end-to-end turbo (includes exact-path fallback) ---------------
    t0 = time.time()
    _, smiles = dec_mod.decode_hier_turbo(model, params, vocab,
                                          common_atom_vocab, rv,
                                          greedy=True, max_decode_step=T,
                                          log_steps=False)
    e2e = time.time() - t0
    report['turbo_e2e_s'] = round(e2e, 1)
    report['turbo_mols_per_sec'] = round(B / e2e, 2)
    report['valid_frac'] = round(
        sum(s is not None for s in smiles) / B, 3)
    report['turbo_stats'] = {k: v for k, v in dec_mod.TURBO_STATS.items()
                             if not isinstance(v, (list, dict))
                             or len(str(v)) < 200}

    with open(args.out, 'w') as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=1), flush=True)


if __name__ == '__main__':
    main()
