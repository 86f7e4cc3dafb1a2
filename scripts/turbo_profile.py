"""Profile decode_motif_turbo: rounds, pending counts, propose vs replay
time, and the host-chemistry split inside replay.

Runs on the CPU backend by default (JAX_PLATFORMS=cpu) so profiling never
contends with TPU artifact runs; divergence statistics are
hardware-independent.

Usage: JAX_PLATFORMS=cpu python scripts/turbo_profile.py [--n 120]
"""

import argparse
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ckpt', default='runs/QUALITY_hopv.json.ckpt')
    ap.add_argument('--vocab', default='runs/QUALITY_hopv.json.vocab.txt')
    ap.add_argument('--data', default='data/hopv15.csv')
    ap.add_argument('--n', type=int, default=120)
    ap.add_argument('--hidden', type=int, default=250)
    ap.add_argument('--latent', type=int, default=24)
    ap.add_argument('--model', default='prop-opt',
                    help="registry name ('prop-opt', 'hier-prop', ...); "
                         'hier models profile the hier turbo/exact paths')
    ap.add_argument('--mode', default='turbo', choices=['turbo', 'exact'])
    ap.add_argument('--profile', action='store_true')
    ap.add_argument('--repeat', type=int, default=1,
                    help='time the decode N times; later repeats are fully '
                         'warm (no XLA compile), reported per-repeat')
    ap.add_argument('--chunk', type=int, default=None,
                    help='pipelined chunk width for the motif turbo path')
    ap.add_argument('--no-instrument', action='store_true',
                    help='skip the propose/replay timers: the propose timer '
                         'forces a fetch inside each call, which serialises '
                         'the chunk pipeline it is trying to measure')
    args = ap.parse_args()

    import jax
    if 'cpu' in os.environ.get('JAX_PLATFORMS', ''):
        # the env var alone does not stop the axon plugin from initialising
        # (and hanging on a wedged tunnel); select cpu via config
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from ggpm_tpu.cli.common import read_csv_data
    from ggpm_tpu.data.batching import to_model_batch
    from ggpm_tpu.data.dataset import prune_to_vocab
    from ggpm_tpu.data.vocab_extract import load_vocab_file
    from ggpm_tpu.graph.mol_graph import tensorize
    from ggpm_tpu.graph.vocab import common_atom_vocab
    from ggpm_tpu.models import decode as dec_mod
    from ggpm_tpu.models.vae import ModelConfig, OPVNet
    from ggpm_tpu.train import checkpoint as ckpt
    from ggpm_tpu.train.loop import init_params_on_cpu

    vocab, _ = load_vocab_file(args.vocab)
    data = prune_to_vocab(read_csv_data(args.data), vocab)
    # repeat to fill n
    while len(data) < args.n:
        data = data + data
    data = data[:args.n]

    is_hier = args.model.startswith('hier')
    cfg = ModelConfig(hvocab_size=vocab.size()[0], ivocab_size=vocab.size()[1],
                      rnn_type='LSTM', hidden_size=args.hidden,
                      embed_size=args.hidden, latent_size=args.latent,
                      linear_hidden_size=128, depthT=20, depthG=20,
                      diterT=1, diterG=3, remat=is_hier)
    model = OPVNet.get_model(args.model)(cfg=cfg)

    bs = 20
    mb0 = tensorize(data[:bs], vocab, common_atom_vocab)
    batch0 = jax.tree.map(jnp.asarray, to_model_batch(mb0, vocab.mask,
                                                      pad=False))
    params = init_params_on_cpu(model, batch0, jax.random.PRNGKey(0), 0.1)
    params = ckpt.load_params(params, args.ckpt)

    zs = []
    for i in range(0, len(data), bs):
        chunk = data[i:i + bs]
        mb = tensorize(chunk, vocab, common_atom_vocab)
        batch = jax.tree.map(jnp.asarray, to_model_batch(mb, vocab.mask,
                                                         pad=False))
        if is_hier:
            z, _ = model.apply(params, batch['tree'],
                               method=lambda m, t: m.encode_latent(
                                   t, graph=batch['graph'], perturb=False))
        else:
            z, _ = model.apply(params, batch['tree'],
                               method=lambda m, t: m.encode_latent(
                                   t, perturb=False))
        zs.append(np.asarray(z))
    zs = np.concatenate(zs)[:args.n]
    print(f'encoded {len(zs)}', flush=True)

    # instrument the turbo loop
    prof_rounds = []
    replay_name = '_replay_hier' if is_hier else '_replay_pinned'
    orig_replay = getattr(dec_mod, replay_name)

    replay_time = [0.0]
    propose_time = [0.0]

    def timed_replay(*a, **k):
        t0 = time.perf_counter()
        out = orig_replay(*a, **k)
        replay_time[0] += time.perf_counter() - t0
        return out
    if not args.no_instrument:
        setattr(dec_mod, replay_name, timed_replay)

    if is_hier:
        fn = dec_mod.decode_hier_turbo if args.mode == 'turbo' \
            else dec_mod.decode_hier
    else:
        fn = dec_mod.decode_motif_turbo if args.mode == 'turbo' \
            else dec_mod.decode_motif

    # warm up compile on a small call
    t0 = time.perf_counter()
    fn(model, params, vocab, common_atom_vocab, zs[:4], greedy=True,
       max_decode_step=150, log_steps=False)
    print(f'warmup(4): {time.perf_counter()-t0:.1f}s', flush=True)

    # patch kernel propose to time it (kernel now exists in cache)
    kern_cls = dec_mod.HierDecodeKernel if is_hier \
        else dec_mod.MotifDecodeKernel
    kern = dec_mod._get_kernel(kern_cls, model, params, vocab.mask, 5)
    orig_propose = kern.propose

    def timed_propose(*args):
        t0 = time.perf_counter()
        out = orig_propose(*args)
        out = tuple(np.asarray(o) for o in out)  # force fetch here
        propose_time[0] += time.perf_counter() - t0
        prof_rounds.append(time.perf_counter() - t0)
        return out
    if not args.no_instrument:
        kern.propose = timed_propose

    for rep in range(args.repeat):
        prof_rounds.clear()
        replay_time[0] = 0.0
        propose_time[0] = 0.0
        t0 = time.perf_counter()
        if args.profile:
            pr = cProfile.Profile()
            pr.enable()
        kw = {}
        if args.chunk and not is_hier and args.mode == 'turbo':
            kw['chunk'] = args.chunk
        results, smiles = fn(model, params, vocab, common_atom_vocab, zs,
                             greedy=True, max_decode_step=150,
                             log_steps=False, **kw)
        if args.profile:
            pr.disable()
        wall = time.perf_counter() - t0
        ok = sum(1 for s in smiles if s)
        print(f'{args.mode}[{rep}]: {len(zs)} mols in {wall:.1f}s = '
              f'{len(zs)/wall:.1f} mols/sec ({ok} non-None)', flush=True)
        print(f'  propose calls: {len(prof_rounds)}, '
              f'total {propose_time[0]:.1f}s '
              f'({[round(x, 2) for x in prof_rounds[:20]]})', flush=True)
        print(f'  replay total: {replay_time[0]:.1f}s', flush=True)
    if args.profile:
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats('cumulative')
        ps.print_stats(30)
        print(s.getvalue())


if __name__ == '__main__':
    main()
