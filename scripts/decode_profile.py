"""Decode profiler: time split + speculation statistics on a trained ckpt.

Measures, for ``decode_motif`` at quality-run batch size:
  * wall time and mols/sec,
  * cumulative host-chemistry time (get_assm_cands / try_add_mol / add_mol),
  * time spent in the fused device step + fetch,
  * how often assembly succeeds on beam candidate 0 (the speculative
    fast-path hit rate for a device-resident proposal scan), vs beam
    fallbacks (kk>0) and forced backtracks.

Usage: python scripts/decode_profile.py [--ckpt runs/QUALITY_hopv.json.ckpt]
"""

import argparse
import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ckpt', default='runs/QUALITY_hopv.json.ckpt')
    ap.add_argument('--vocab', default='runs/QUALITY_hopv.json.vocab.txt')
    ap.add_argument('--data', default='data/hopv15.csv')
    ap.add_argument('--batch', type=int, default=120)
    ap.add_argument('--model', default='prop-opt')
    ap.add_argument('--hidden', type=int, default=250)
    ap.add_argument('--latent', type=int, default=24)
    ap.add_argument('--steps', type=int, default=150)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ggpm_tpu.cli.common import read_csv_data
    from ggpm_tpu.data.batching import to_model_batch
    from ggpm_tpu.data.dataset import prune_to_vocab
    from ggpm_tpu.data.vocab_extract import load_vocab_file
    from ggpm_tpu.graph.mol_graph import tensorize
    from ggpm_tpu.graph.vocab import PairVocab, common_atom_vocab
    from ggpm_tpu.models import decode as dec_mod
    from ggpm_tpu.models.inc_graph import IncGraph
    from ggpm_tpu.models.vae import ModelConfig, OPVNet
    from ggpm_tpu.train import checkpoint as ckpt_mod
    from ggpm_tpu.train.loop import init_params_on_cpu

    vocab, _ = load_vocab_file(args.vocab)
    data = prune_to_vocab(read_csv_data(args.data), vocab)
    data = data[:args.batch]

    cfg = ModelConfig(hvocab_size=vocab.size()[0], ivocab_size=vocab.size()[1],
                      rnn_type='LSTM', hidden_size=args.hidden,
                      embed_size=args.hidden, latent_size=args.latent,
                      linear_hidden_size=128, depthT=20, diterT=1, dropout=0.0)
    model = OPVNet.get_model(args.model)(cfg=cfg)

    mb = tensorize(data[:20], vocab, common_atom_vocab)
    batch = jax.tree.map(jnp.asarray, to_model_batch(mb, vocab.mask, pad=False))
    template = init_params_on_cpu(model, batch, jax.random.PRNGKey(0))
    params = ckpt_mod.load_params(template, args.ckpt)

    # encode the batch
    mbs = tensorize(data, vocab, common_atom_vocab)
    full = jax.tree.map(jnp.asarray, to_model_batch(mbs, vocab.mask, pad=False))
    z, _ = model.apply(params, full['tree'],
                       method=lambda m, tree: m.encode_latent(tree, perturb=False))
    z = np.asarray(z)
    print(f'encoded {z.shape[0]} molecules', flush=True)

    # --- instrument chemistry + assembly ---------------------------------
    stats = Counter()
    times = Counter()

    def timed(obj, name):
        orig = getattr(obj, name)

        def wrap(*a, **k):
            t0 = time.perf_counter()
            out = orig(*a, **k)
            times[name] += time.perf_counter() - t0
            stats['n_' + name] += 1
            return out
        setattr(obj, name, wrap)

    timed(IncGraph, 'get_assm_cands')
    timed(IncGraph, 'try_add_mol')
    timed(IncGraph, 'add_mol')
    timed(IncGraph, 'get_smiles')

    orig_try = dec_mod._try_assemble

    def try_assemble(tree, graph, vocab_, b, new_node, fa_node, cls_beam,
                     cls_topk_row, icls_topk_row, score_cands, log_entry):
        t0 = time.perf_counter()
        hit_kk = [None]

        class BeamProbe:
            def __iter__(self):
                for kk in cls_beam:
                    hit_kk[0] = kk
                    yield kk
        ok = orig_try(tree, graph, vocab_, b, new_node, fa_node, BeamProbe(),
                      cls_topk_row, icls_topk_row, score_cands, log_entry)
        times['assemble'] += time.perf_counter() - t0
        if not ok:
            stats['forced_backtrack'] += 1
        elif hit_kk[0] == 0:
            stats['beam0'] += 1
        else:
            stats['beam_fallback'] += 1
            stats[f'beam_kk{hit_kk[0]}'] += 1
        return ok
    dec_mod._try_assemble = try_assemble

    # time the device step + fetch
    orig_get_kernel = dec_mod._get_kernel

    def get_kernel(cls, model_, params_, mask_, beam_):
        kern = orig_get_kernel(cls, model_, params_, mask_, beam_)
        if not getattr(kern, '_profiled', False):
            kern._profiled = True
            orig_step = kern.step_fused

            def step(*a):
                t0 = time.perf_counter()
                out = orig_step(*a)
                times['device_dispatch'] += time.perf_counter() - t0
                stats['n_steps'] += 1
                return out
            kern.step_fused = step
        return kern
    dec_mod._get_kernel = get_kernel

    _orig_np_asarray = np.asarray

    # warmup (compile)
    print('warmup...', flush=True)
    dec_mod.decode_motif(model, params, vocab, common_atom_vocab, z[:8],
                         greedy=True, max_decode_step=10, log_steps=False)
    stats.clear()
    times.clear()

    print('timed decode...', flush=True)
    t0 = time.time()
    _, smiles = dec_mod.decode_motif(model, params, vocab, common_atom_vocab,
                                     z, greedy=True,
                                     max_decode_step=args.steps,
                                     log_steps=False)
    wall = time.time() - t0

    n = len(z)
    valid = sum(s is not None for s in smiles)
    expands = stats['beam0'] + stats['beam_fallback'] + stats['forced_backtrack']
    print(f'\nwall {wall:.2f}s  {n / wall:.1f} mols/sec  valid {valid}/{n}')
    print(f"decode steps (device calls): {stats['n_steps']}")
    print('time split:')
    for k in ('device_dispatch', 'assemble', 'get_assm_cands', 'try_add_mol',
              'add_mol', 'get_smiles'):
        print(f'  {k:18s} {times[k]:7.2f}s  (n={stats["n_" + k] or stats["n_steps"]})')
    other = wall - times['device_dispatch'] - times['assemble'] - times['get_smiles']
    print(f'  {"other (host bookkeeping/packing/fetch)":18s} {other:7.2f}s')
    print(f'\nassembly events: {expands}')
    if expands:
        print(f"  beam-0 success:   {stats['beam0']} ({stats['beam0'] / expands:.1%})")
        print(f"  beam fallback:    {stats['beam_fallback']} ({stats['beam_fallback'] / expands:.1%})")
        print(f"  forced backtrack: {stats['forced_backtrack']} ({stats['forced_backtrack'] / expands:.1%})")
    # per-molecule speculation success: a molecule is fast-path iff it never
    # diverged — approximate from per-event counts is not possible, so count
    # exactly by replay bookkeeping in the turbo implementation; here report
    # the upper bound (1 - P(any divergence)) assuming uniform spread
    div_events = stats['beam_fallback'] + stats['forced_backtrack']
    print(f'\ndivergence events total: {div_events} over {n} molecules')


if __name__ == '__main__':
    main()
