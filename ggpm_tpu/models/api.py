"""Model-level convenience API mirroring the reference VAE surface.

The reference exposes ``model.reconstruct(batch, args)`` /
``model.sample(batch_size)`` / ``model.optimize_recs(batch, args)``
(property_vae.py:35-45, 101-109, 190-204, 299-334).  Under JAX the decode
loop interleaves host chemistry, so these live as functions taking
``(model, params, …)`` instead of methods.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batching import to_model_batch
from ..graph.vocab import PairVocab, common_atom_vocab
from .decode import decode_best, decode_hier, decode_motif, sample_prior


def _is_hier(model) -> bool:
    return type(model).__name__.startswith('Hier')


def encode(model, params, batch: dict, perturb: bool = False,
           rng: Optional[jax.Array] = None):
    """Latent code of a model batch (no noise by default — reference
    eval-time convention)."""
    if _is_hier(model):
        z, kl = model.apply(params, batch['tree'],
                            method=lambda m, tree: m.encode_latent(
                                tree, rng, perturb, True,
                                graph=batch['graph']))
    else:
        z, kl = model.apply(params, batch['tree'],
                            method=lambda m, tree: m.encode_latent(
                                tree, rng, perturb, True))
    return z, kl


def reconstruct(model, params, mb, vocab: PairVocab, avocab=common_atom_vocab,
                greedy: bool = True, max_decode_step: int = 150, **kwargs):
    """Encode without noise, then decode greedily (reference
    ``reconstruct``).  Returns (property_outputs_or_None, (results, smiles))."""
    batch = jax.tree.map(jnp.asarray, to_model_batch(mb, vocab.mask, pad=False))
    z, _ = encode(model, params, batch, perturb=False)
    props = None
    if hasattr(model, 'predict_properties'):
        props = model.apply(params, z,
                            method=lambda m, zz: m.predict_properties(zz))
        props = (np.asarray(props[0]), np.asarray(props[1]))
    out = decode_best(model, params, vocab, avocab, np.asarray(z),
                      greedy=greedy, max_decode_step=max_decode_step, **kwargs)
    return props, out


def sample(model, params, vocab: PairVocab, batch_size: int,
           avocab=common_atom_vocab, seed: int = 0, **kwargs):
    """Sample from the prior (reference ``sample``)."""
    return sample_prior(model, params, vocab, avocab, batch_size,
                        rng=np.random.default_rng(seed), **kwargs)


def _enum_prune_chunk(task):
    """Pool worker: build rootings + vocab-prune for a chunk of molecules
    (each variant costs a full MolGraph decomposition — the enum-root
    host side was ~25 single-core minutes at the 4,882-molecule polymers
    eval before this fan-out)."""
    rows, max_roots, vocab = task
    from ..chem import get_mol, mol_to_smiles
    from ..data.dataset import prune_to_vocab
    from ..graph.chemutils import get_leaves
    out = []
    for i, smiles in rows:
        mol = get_mol(smiles)
        if mol is None:
            continue
        roots = get_leaves(mol)[:max_roots]
        vs = sorted({mol_to_smiles(mol, root=r) for r in roots}) or [smiles]
        for row in prune_to_vocab([[v, None, None] for v in vs], vocab,
                                  verbose=False):
            out.append((i, row[0]))
    return out


def reconstruct_enum_roots(model, params, smiles_list, vocab: PairVocab,
                           avocab=common_atom_vocab, max_roots: int = 6,
                           max_decode_step: int = 150,
                           decode_batch: int = 120, ncpu: int = 8, **kwargs):
    """Robust reconstruction via root enumeration (the reference's
    MolEnumRootDataset protocol, dataset.py:46-75 + vae_test harness):
    re-root each input SMILES at its leaves, encode/decode every rooting, and
    report success if any decode reproduces the molecule.

    All molecules' rootings are pooled and decoded in fixed-size batches
    (padded by repetition) so the whole evaluation compiles at most two
    decode shapes instead of one per molecule.

    Returns [(original, best_decode, matched_bool)].
    """
    from ..chem import canon_smiles
    from ..data.vocab_extract import tensorize_batches

    import time as _time
    _t0 = _time.time()
    rows = list(enumerate(smiles_list))
    tasks = [(rows[i:i + 64], max_roots, vocab)
             for i in range(0, len(rows), 64)]
    if ncpu > 1 and len(tasks) > 1:
        from multiprocessing import Pool
        with Pool(min(ncpu, len(tasks))) as pool:
            chunks = pool.map(_enum_prune_chunk, tasks)
    else:
        chunks = [_enum_prune_chunk(t) for t in tasks]
    variants, src = [], []
    for ch in chunks:
        for i, v in ch:
            variants.append(v)
            src.append(i)
    if len(variants) > 4096:
        print(f'enum-root: {len(variants)} rootings for '
              f'{len(smiles_list)} molecules ({_time.time() - _t0:.0f}s)',
              flush=True)

    # tensorize every chunk on the pool, then encode (bucket-padded:
    # bit-identical latents, a handful of compile shapes)
    vchunks = [[[v, None, None] for v in variants[i:i + 64]]
               for i in range(0, len(variants), 64)]
    mbs = tensorize_batches(vchunks, vocab, avocab, ncpu=ncpu)
    zs = []
    for k, mb in enumerate(mbs):
        if k and (k * 64) % 8192 == 0:
            print(f'enum-root: encoded {k * 64}/{len(variants)} rootings '
                  f'({_time.time() - _t0:.0f}s)', flush=True)
        batch = jax.tree.map(jnp.asarray,
                             to_model_batch(mb, vocab.mask, pad=False))
        z, _ = encode(model, params, batch, perturb=False)
        zs.append(np.asarray(z)[:len(vchunks[k])])
    z_all = (np.concatenate(zs) if zs
             else np.zeros((0, model.cfg.latent_size), np.float32))

    decoded: list = []
    if len(z_all):
        # one pipelined call: chunk k+1's propose scan runs on device while
        # the host replays chunk k (decode_motif_turbo's chunk path)
        _, sm = decode_best(model, params, vocab, avocab, z_all, greedy=True,
                            max_decode_step=max_decode_step,
                            log_steps=False, chunk=decode_batch, **kwargs)
        decoded = list(sm)

    by_src: dict = {}
    for v_idx, s_idx in enumerate(src):
        by_src.setdefault(s_idx, []).append(v_idx)
    out = []
    for i, smiles in enumerate(smiles_list):
        target = canon_smiles(smiles)
        best, matched = None, False
        for v_idx in by_src.get(i, []):
            d = decoded[v_idx]
            if d is None:
                continue
            if best is None:
                best = d
            if canon_smiles(d) == target:
                best, matched = d, True
                break
        out.append((smiles, best, matched))
    return out


def optimize_recs(model, params, mb, vocab: PairVocab,
                  avocab=common_atom_vocab, optimize_type: str = 'hard',
                  **opt_kwargs):
    """Latent property-optimization + decode (reference ``optimize_recs``)."""
    from ..latent.control import LatentOptimizer
    batch = jax.tree.map(jnp.asarray, to_model_batch(mb, vocab.mask, pad=False))
    z, _ = encode(model, params, batch, perturb=False)
    opt = LatentOptimizer(model, params, optimize_type=optimize_type,
                          **opt_kwargs)
    z_opt = opt.optimize(z, mb.homos, mb.lumos)
    props = model.apply(params, z_opt,
                        method=lambda m, zz: m.predict_properties(zz))
    out = decode_best(model, params, vocab, avocab, np.asarray(z_opt),
                      greedy=True, max_decode_step=150)
    return (np.asarray(props[0]), np.asarray(props[1])), out
