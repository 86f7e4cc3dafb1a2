"""Autoregressive decode tests: validity, reconstruction, sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from ggpm_tpu.chem import canon_smiles, get_mol
from ggpm_tpu.data.batching import to_model_batch
from ggpm_tpu.graph.vocab import common_atom_vocab
from ggpm_tpu.models.decode import decode_motif, hier_topk


def test_reconstruction_validity(tiny_model_setup):
    st = tiny_model_setup
    model, params, vocab = st['model'], st['params'], st['vocab']
    mb = st['batches'][0]
    batch = jax.tree.map(jnp.asarray, to_model_batch(mb, vocab.mask, pad=False))
    z, _ = model.apply(params, batch['tree'],
                       method=lambda m, tree: m.encode_latent(tree, perturb=False))
    results, smiles = decode_motif(model, params, vocab, common_atom_vocab,
                                   np.asarray(z), greedy=True,
                                   max_decode_step=60)
    assert len(smiles) == len(mb.smiles)
    valid = [s for s in smiles if s and get_mol(s) is not None]
    assert len(valid) >= len(smiles) * 0.7
    # at least one exact reconstruction on the training molecules
    matches = sum(1 for o, d in zip(mb.smiles, smiles)
                  if d and canon_smiles(o) == canon_smiles(d))
    assert matches >= 1
    # per-step logs exist
    assert results[0][0]['root']


def test_prior_sampling(tiny_model_setup):
    st = tiny_model_setup
    rng = np.random.default_rng(0)
    z = rng.normal(size=(6, st['cfg'].latent_size)).astype(np.float32)
    _, smiles = decode_motif(st['model'], st['params'], st['vocab'],
                             common_atom_vocab, z, greedy=True,
                             max_decode_step=40, log_steps=False)
    assert any(s is not None for s in smiles)


def test_nongreedy_sampling(tiny_model_setup):
    st = tiny_model_setup
    z = np.zeros((4, st['cfg'].latent_size), dtype=np.float32)
    _, s1 = decode_motif(st['model'], st['params'], st['vocab'],
                         common_atom_vocab, z, greedy=False,
                         max_decode_step=30,
                         rng=np.random.default_rng(1), log_steps=False)
    _, s2 = decode_motif(st['model'], st['params'], st['vocab'],
                         common_atom_vocab, z, greedy=False,
                         max_decode_step=30,
                         rng=np.random.default_rng(2), log_steps=False)
    assert len(s1) == len(s2) == 4


def test_hier_topk_agrees_with_bruteforce():
    rng = np.random.default_rng(0)
    b, hv, iv, k = 3, 7, 11, 3
    cls = rng.normal(size=(b, hv)).astype(np.float32)
    icls = rng.normal(size=(b, iv)).astype(np.float32)
    mask = np.where(rng.random((hv, iv)) < 0.4, 0.0, -1000.0).astype(np.float32)
    mask[:, 0] = 0.0  # every row has at least one allowed icls
    scores, cls_k, icls_k = jax.jit(
        lambda c, i: hier_topk(c, i, jnp.asarray(mask), k))(cls, icls)
    scores = np.asarray(scores)

    # brute force joint score over (cls, icls)
    def lsm(x, axis=-1):
        x = x - x.max(axis=axis, keepdims=True)
        return x - np.log(np.exp(x).sum(axis=axis, keepdims=True))
    cl = lsm(cls)
    for bi in range(b):
        joint = []
        order = np.argsort(-cl[bi])[:k]
        for c in order:
            il = lsm(icls[bi] + mask[c])
            for i in np.argsort(-il)[:k]:
                joint.append(cl[bi, c] + il[i])
        best = sorted(joint, reverse=True)[:k]
        np.testing.assert_allclose(scores[bi], best, rtol=1e-5)


def test_inc_graph_assembly():
    """IncGraph grows a molecule motif-by-motif with validity checks."""
    from ggpm_tpu.models.inc_graph import IncGraph
    g = IncGraph(common_atom_vocab, batch_size=1, max_nodes=50, max_edges=80)
    atoms, bonds, attached = g.add_mol(0, 'C1=CC=CC=C1', [], 0)
    assert len(atoms) == 6
    smiles = g.get_smiles()
    assert canon_smiles(smiles[0]) == canon_smiles('c1ccccc1')
    # try an invalid over-valent attach: 5th bond on a ring carbon is rejected
    # by sanitize in try_add_mol
    ok = g.try_add_mol(0, 'C', [])  # singleton with no attachment is fine
    assert isinstance(ok, (bool, np.bool_))


def test_hier_decode(tiny_model_setup):
    """Hierarchical decode: valid molecules from a briefly trained hier
    model."""
    import jax
    from ggpm_tpu.models.decode import decode_hier
    from ggpm_tpu.models.vae import HierPropertyVAE
    from ggpm_tpu.train.loop import Trainer
    from ggpm_tpu.train.optim import make_optimizer
    st = tiny_model_setup
    import copy
    cfg = copy.copy(st['cfg'])
    cfg.depthG = 3
    cfg.diterG = 1
    model = HierPropertyVAE(cfg=cfg)
    opt = make_optimizer(lr=2e-3, steps_per_epoch=3)
    tr = Trainer(model, opt, st['vocab'].mask, beta=0.01, print_iter=10**9)
    params, opt_state = tr.init(st['batches'][0])
    for _ in range(6):
        params, opt_state, _ = tr.train_epoch(params, opt_state, st['batches'])
    mb = st['batches'][0]
    batch = jax.tree.map(jnp.asarray,
                         to_model_batch(mb, st['vocab'].mask, pad=False))
    z, _ = model.apply(params, batch['tree'],
                       method=lambda m, tree: m.encode_latent(
                           tree, graph=batch['graph'], perturb=False))
    _, smiles = decode_hier(model, params, st['vocab'], common_atom_vocab,
                            np.asarray(z), greedy=True, max_decode_step=40)
    assert len(smiles) == len(mb.smiles)
    assert sum(1 for s in smiles if s and get_mol(s) is not None) >= 1


def test_enum_root_reconstruction(tiny_model_setup):
    """Root-enumeration reconstruction protocol improves (or at least never
    hurts) exact-match accuracy vs single-rooting."""
    from ggpm_tpu.models.api import reconstruct_enum_roots
    st = tiny_model_setup
    smiles = st['batches'][0].smiles[:4]
    out = reconstruct_enum_roots(st['model'], st['params'], smiles,
                                 st['vocab'], max_roots=3,
                                 max_decode_step=40)
    assert len(out) == 4
    for org, dec, matched in out:
        assert isinstance(matched, bool)
        if matched:
            assert dec is not None


def test_decode_deterministic(tiny_model_setup):
    """Greedy decode is deterministic for a fixed latent."""
    st = tiny_model_setup
    z = np.zeros((3, st['cfg'].latent_size), dtype=np.float32)
    _, s1 = decode_motif(st['model'], st['params'], st['vocab'],
                         common_atom_vocab, z, greedy=True,
                         max_decode_step=30, log_steps=False)
    _, s2 = decode_motif(st['model'], st['params'], st['vocab'],
                         common_atom_vocab, z, greedy=True,
                         max_decode_step=30, log_steps=False)
    assert s1 == s2


def test_turbo_matches_exact_reconstruction(tiny_model_setup):
    """Device-resident speculative decode (pinned-continuation rounds)
    reproduces the exact host-interleaved path bit-for-bit on encoder
    latents of training molecules."""
    from ggpm_tpu.models.decode import decode_motif_turbo
    st = tiny_model_setup
    model, params, vocab = st['model'], st['params'], st['vocab']
    mb = st['batches'][0]
    batch = jax.tree.map(jnp.asarray, to_model_batch(mb, vocab.mask, pad=False))
    z, _ = model.apply(params, batch['tree'],
                       method=lambda m, tree: m.encode_latent(tree, perturb=False))
    z = np.asarray(z)
    _, s_exact = decode_motif(model, params, vocab, common_atom_vocab, z,
                              greedy=True, max_decode_step=60, log_steps=False)
    _, s_turbo = decode_motif_turbo(model, params, vocab, common_atom_vocab,
                                    z, greedy=True, max_decode_step=60)
    assert s_turbo == s_exact


def test_turbo_matches_exact_prior(tiny_model_setup):
    """Turbo ≡ exact on prior samples too — divergence-heavy latents
    exercise the beam-retry and forced-backtrack pinning ops."""
    from ggpm_tpu.models.decode import decode_motif_turbo
    st = tiny_model_setup
    rng = np.random.default_rng(7)
    z = rng.normal(size=(8, st['cfg'].latent_size)).astype(np.float32) * 1.5
    _, s_exact = decode_motif(st['model'], st['params'], st['vocab'],
                              common_atom_vocab, z, greedy=True,
                              max_decode_step=40, log_steps=False)
    _, s_turbo = decode_motif_turbo(st['model'], st['params'], st['vocab'],
                                    common_atom_vocab, z, greedy=True,
                                    max_decode_step=40)
    assert s_turbo == s_exact


def test_decode_kernel_cached_across_calls(tiny_model_setup):
    """Repeated decode calls with the same (model, params, vocab) reuse one
    kernel object — fresh jit closures per call would recompile every step
    function on every call."""
    from ggpm_tpu.models import decode as dec_mod
    st = tiny_model_setup
    z = np.zeros((2, st['cfg'].latent_size), dtype=np.float32)
    decode_motif(st['model'], st['params'], st['vocab'],
                 common_atom_vocab, z, greedy=True,
                 max_decode_step=5, log_steps=False)
    assert any(k[0] is dec_mod.MotifDecodeKernel
               for k in dec_mod._KERNEL_CACHE)
    size = len(dec_mod._KERNEL_CACHE)
    decode_motif(st['model'], st['params'], st['vocab'],
                 common_atom_vocab, z, greedy=True,
                 max_decode_step=5, log_steps=False)
    assert len(dec_mod._KERNEL_CACHE) == size


def test_turbo_oracle_resolves_in_one_round(tiny_model_setup):
    """The per-atom valence oracle is exact: the device commits the same
    beam chemistry would, so every sample resolves in the FIRST propose
    round with zero exact-path fallbacks (the whole point of the turbo
    formulation — one device call + one fetch for the whole batch)."""
    from ggpm_tpu.models.decode import TURBO_STATS, decode_motif_turbo
    st = tiny_model_setup
    model, params, vocab = st['model'], st['params'], st['vocab']
    mb = st['batches'][0]
    batch = jax.tree.map(jnp.asarray, to_model_batch(mb, vocab.mask, pad=False))
    z, _ = model.apply(params, batch['tree'],
                       method=lambda m, tree: m.encode_latent(tree, perturb=False))
    _, smiles = decode_motif_turbo(model, params, vocab, common_atom_vocab,
                                   np.asarray(z), greedy=True,
                                   max_decode_step=60)
    assert any(s is not None for s in smiles)
    assert TURBO_STATS['rounds'] == 1, TURBO_STATS
    assert TURBO_STATS['fallbacks'] == 0, TURBO_STATS


def test_turbo_chunked_pipeline_matches_exact(tiny_model_setup):
    """The pipelined chunk path (all chunks' round-0 proposes dispatched
    before the first fetch, short last chunk padded to the shared width)
    is result-identical to the unchunked call — on divergence-heavy prior
    latents so re-entry rounds interleave between chunks."""
    from ggpm_tpu.models.decode import decode_motif_turbo
    st = tiny_model_setup
    rng = np.random.default_rng(3)
    z = rng.normal(size=(9, st['cfg'].latent_size)).astype(np.float32) * 1.5
    _, s_whole = decode_motif_turbo(st['model'], st['params'], st['vocab'],
                                    common_atom_vocab, z, greedy=True,
                                    max_decode_step=40)
    _, s_chunk = decode_motif_turbo(st['model'], st['params'], st['vocab'],
                                    common_atom_vocab, z, greedy=True,
                                    max_decode_step=40, chunk=4)
    assert s_chunk == s_whole


def test_turbo_ladder_escalation_matches_exact(tiny_model_setup):
    """A deliberately tiny first rung forces the 'continue' path: traces
    run out mid-DFS, every executed step re-enters pinned at the next
    rung — results must stay identical to the exact path."""
    from ggpm_tpu.models.decode import TURBO_STATS, decode_motif_turbo
    st = tiny_model_setup
    model, params, vocab = st['model'], st['params'], st['vocab']
    mb = st['batches'][0]
    batch = jax.tree.map(jnp.asarray, to_model_batch(mb, vocab.mask, pad=False))
    z, _ = model.apply(params, batch['tree'],
                       method=lambda m, tree: m.encode_latent(tree, perturb=False))
    z = np.asarray(z)
    _, s_exact = decode_motif(model, params, vocab, common_atom_vocab, z,
                              greedy=True, max_decode_step=60, log_steps=False)
    _, s_turbo = decode_motif_turbo(model, params, vocab, common_atom_vocab,
                                    z, greedy=True, max_decode_step=60,
                                    ladder=(4, 16))
    assert s_turbo == s_exact
    assert TURBO_STATS['rungs'][0] == 4          # short rung actually used
    assert len(TURBO_STATS['rungs']) >= 2        # and escalation happened


def test_hier_turbo_matches_exact(tiny_model_setup):
    """Hier device-resident decode ≡ the exact host-interleaved path on
    both reconstruction latents and prior samples (the scan carries the
    full 3-level message state, candidate scoring, and IncGraph's row
    bookkeeping — see HierDecoder.hdec_propose)."""
    import copy
    from ggpm_tpu.models.decode import (TURBO_STATS, decode_hier,
                                        decode_hier_turbo)
    from ggpm_tpu.models.vae import HierPropertyVAE
    from ggpm_tpu.train.loop import Trainer
    from ggpm_tpu.train.optim import make_optimizer
    st = tiny_model_setup
    cfg = copy.copy(st['cfg'])
    cfg.depthG = 3
    cfg.diterG = 1
    model = HierPropertyVAE(cfg=cfg)
    opt = make_optimizer(lr=2e-3, steps_per_epoch=3)
    tr = Trainer(model, opt, st['vocab'].mask, beta=0.01, print_iter=10 ** 9)
    params, opt_state = tr.init(st['batches'][0])
    for _ in range(6):
        params, opt_state, _ = tr.train_epoch(params, opt_state,
                                              st['batches'])
    mb = st['batches'][0]
    batch = jax.tree.map(jnp.asarray,
                         to_model_batch(mb, st['vocab'].mask, pad=False))
    z, _ = model.apply(params, batch['tree'],
                       method=lambda m, tree: m.encode_latent(
                           tree, graph=batch['graph'], perturb=False))
    z = np.asarray(z)
    _, s_exact = decode_hier(model, params, st['vocab'], common_atom_vocab,
                             z, greedy=True, max_decode_step=40)
    _, s_turbo = decode_hier_turbo(model, params, st['vocab'],
                                   common_atom_vocab, z, greedy=True,
                                   max_decode_step=40)
    assert s_turbo == s_exact
    assert TURBO_STATS['fallbacks'] == 0, TURBO_STATS
    rng = np.random.default_rng(3)
    zp = rng.normal(size=(6, st['cfg'].latent_size)).astype(np.float32)
    _, p_exact = decode_hier(model, params, st['vocab'], common_atom_vocab,
                             zp, greedy=True, max_decode_step=40)
    _, p_turbo = decode_hier_turbo(model, params, st['vocab'],
                                   common_atom_vocab, zp, greedy=True,
                                   max_decode_step=40)
    assert p_turbo == p_exact
    # pipelined chunk path: identical results with interleaved rung
    # re-dispatches across chunks
    _, p_chunk = decode_hier_turbo(model, params, st['vocab'],
                                   common_atom_vocab, zp, greedy=True,
                                   max_decode_step=40, chunk=4)
    assert p_chunk == p_exact


def test_hier_propose_budget_poisons(tiny_model_setup):
    """A graft that would outrun the static edge-row budget (Eg) poisons
    the sample in-scan — forcing exact-path fallback — instead of writing
    message rows into the NEXT sample's flat region (cross-sample
    corruption).  Run hdec_propose with Eg=0: every committed motif that
    needs any edge rows must come out poisoned."""
    import copy
    from ggpm_tpu.models.decode import _assm_tables
    from ggpm_tpu.models.vae import HierPropertyVAE
    from ggpm_tpu.train.loop import Trainer
    from ggpm_tpu.train.optim import make_optimizer
    st = tiny_model_setup
    cfg = copy.copy(st['cfg'])
    cfg.depthG = 3
    cfg.diterG = 1
    model = HierPropertyVAE(cfg=cfg)
    opt = make_optimizer(lr=2e-3, steps_per_epoch=3)
    tr = Trainer(model, opt, st['vocab'].mask, beta=0.01, print_iter=10 ** 9)
    params, _ = tr.init(st['batches'][0])
    tabs = _assm_tables(st['vocab'], common_atom_vocab)
    K, B, T = 5, 4, 10
    rng = np.random.default_rng(0)
    rv = rng.normal(size=(B, st['cfg'].latent_size)).astype(np.float32)
    u = jnp.full((T, B), 0.5, jnp.float32)
    packed, _, _, poisoned = model.apply(
        params, jnp.asarray(rv), jnp.asarray(st['vocab'].mask), u, tabs, K,
        method=lambda m, *a: m._decoder().hdec_propose(*a, Eg=0))
    packed = np.asarray(packed)
    poisoned = np.asarray(poisoned)
    commit = (packed[:, :, 1] > 0.5) & (packed[:, :, 2 + 3 * K] >= 0)
    nbond = np.asarray(tabs['nbond'])[packed[:, :, 2 + 3 * K + 1].astype(int)]
    needs_rows = (commit & (nbond > 0)).any(axis=0)
    assert np.all(poisoned[needs_rows]), (poisoned, needs_rows)


def test_attention_model_decode_with_src_mem(tiny_model_setup):
    """use_attention models decode with their heads attending over the
    encoder's node memory (the contexts they were trained with) when
    src_mem/src_scope are passed; without them the guard still refuses.
    The reference's own attention decode path is unusable (torch.bmm over
    2-D gathered vectors throws), so this exceeds parity."""
    import copy

    import pytest

    from ggpm_tpu.models.decode import decode_motif
    from ggpm_tpu.models.vae import PropertyVAE
    from ggpm_tpu.train.loop import Trainer
    from ggpm_tpu.train.optim import make_optimizer
    st = tiny_model_setup
    cfg = copy.copy(st['cfg'])
    cfg.use_attention = True
    model = PropertyVAE(cfg=cfg)
    opt = make_optimizer(lr=2e-3, steps_per_epoch=3)
    tr = Trainer(model, opt, st['vocab'].mask, beta=0.01, print_iter=10 ** 9)
    params, opt_state = tr.init(st['batches'][0])
    for _ in range(8):
        params, opt_state, _ = tr.train_epoch(params, opt_state,
                                              st['batches'])
    mb = st['batches'][0]
    batch = jax.tree.map(jnp.asarray,
                         to_model_batch(mb, st['vocab'].mask, pad=False))
    z, _ = model.apply(params, batch['tree'],
                       method=lambda m, t: m.encode_latent(t, perturb=False))
    src_mem, scope = model.apply(
        params, batch['tree'],
        method=lambda m, t: m.encode_attention_memory(t))

    with pytest.raises(NotImplementedError):
        decode_motif(model, params, st['vocab'], common_atom_vocab,
                     np.asarray(z), greedy=True, max_decode_step=40,
                     log_steps=False)

    _, smiles = decode_motif(model, params, st['vocab'], common_atom_vocab,
                             np.asarray(z), greedy=True, max_decode_step=40,
                             log_steps=False, src_mem=src_mem,
                             src_scope=np.asarray(scope))
    assert len(smiles) == len(mb.smiles)
    valid = [s for s in smiles if s and get_mol(s) is not None]
    assert len(valid) >= len(smiles) * 0.5, smiles


def test_hier_replay_catches_mask_tampering(tiny_model_setup):
    """The hier replay verifies the device's per-candidate feasibility
    bitmasks against real chemistry: clearing the CHOSEN candidate's bit
    (an induced oracle false-negative) must make _replay_hier fall back
    ('diverge'), not silently accept the trace."""
    import copy
    from ggpm_tpu.models.decode import (_assm_tables, _replay_hier,
                                        _hier_candidate)
    from ggpm_tpu.models.vae import HierPropertyVAE
    from ggpm_tpu.train.loop import Trainer
    from ggpm_tpu.train.optim import make_optimizer
    st = tiny_model_setup
    cfg = copy.copy(st['cfg'])
    cfg.depthG = 3
    cfg.diterG = 1
    model = HierPropertyVAE(cfg=cfg)
    opt = make_optimizer(lr=2e-3, steps_per_epoch=3)
    tr = Trainer(model, opt, st['vocab'].mask, beta=0.01, print_iter=10 ** 9)
    params, opt_state = tr.init(st['batches'][0])
    for _ in range(6):
        params, opt_state, _ = tr.train_epoch(params, opt_state,
                                              st['batches'])
    tabs = _assm_tables(st['vocab'], common_atom_vocab)
    K, B, T = 5, 6, 25
    rng = np.random.default_rng(5)
    rv = rng.normal(size=(B, st['cfg'].latent_size)).astype(np.float32)
    u = jnp.full((T, B), 0.5, jnp.float32)
    packed, rc, ri, poisoned = model.apply(
        params, jnp.asarray(rv), jnp.asarray(st['vocab'].mask), u, tabs, K,
        method=lambda m, *a: m._decoder().hdec_propose(*a))
    packed = np.asarray(packed)
    rc, ri = np.asarray(rc), np.asarray(ri)
    poisoned = np.asarray(poisoned)

    tampered = 0
    for b in range(B):
        if poisoned[b]:
            continue
        # clean trace must replay
        status, out = _replay_hier(packed[:, b, :], rc[b], ri[b],
                                   st['vocab'], common_atom_vocab, K,
                                   400, 500)
        if status != 'done' or out is None:
            continue
        # find the first commit step and clear the chosen candidate's bit
        for t in range(T):
            if packed[t, b, 1] > 0.5 and packed[t, b, 2 + 3 * K] >= 0:
                kind = int(packed[t, b, 2 + 3 * K + 2])
                slot = int(packed[t, b, 2 + 3 * K + 3])
                col = 2 + 3 * K + 4 + (0 if kind == 0 else
                                       (1 if kind == 1 else 2))
                bad = packed[:, b, :].copy()
                mask = int(bad[t, col])
                if not (mask >> slot) & 1:
                    continue
                bad[t, col] = float(mask & ~(1 << slot))
                status2, _ = _replay_hier(bad, rc[b], ri[b], st['vocab'],
                                          common_atom_vocab, K, 400, 500)
                assert status2 == 'diverge', (b, t, kind, slot)
                tampered += 1
                break
    assert tampered >= 1, 'no tamperable commit step found'


def test_graft_rows_vec_matches_sequential(tiny_model_setup):
    """The loop-free graft bookkeeping (HierDecoder._graft_rows_vec) is
    bit-exact vs the sequential bond loop (_graft_rows) on states EVOLVED
    BY REAL GRAFTS (the closed form relies on add_edge's fill-level
    invariant, which holds exactly for reachable states): root grafts,
    then a chain of child grafts with mixed attach aliasing, skip_anchor,
    masked samples, and varied motifs."""
    import copy
    from ggpm_tpu.models.decode import _assm_tables
    from ggpm_tpu.models.vae import HierPropertyVAE
    from ggpm_tpu.train.loop import Trainer
    from ggpm_tpu.train.optim import make_optimizer
    st = tiny_model_setup
    cfg = copy.copy(st['cfg'])
    cfg.depthG = 3
    cfg.diterG = 1
    model = HierPropertyVAE(cfg=cfg)
    opt = make_optimizer(lr=2e-3, steps_per_epoch=3)
    tr = Trainer(model, opt, st['vocab'].mask, beta=0.01, print_iter=10 ** 9)
    params, _ = tr.init(st['batches'][0])
    tabs = _assm_tables(st['vocab'], common_atom_vocab)

    B, A, Eg, NBG, KE, n_nodes = 5, 64, 96, 8, 24, 8
    S = tabs['stype'].shape[1]
    rng = np.random.default_rng(0)
    b_of_e = (np.arange(B) * Eg).astype(np.int32)
    b_of_a = (np.arange(B) * A).astype(np.int32)

    def run(name, carry, ilab, ch_atom_f, do_c, nth, skip, nn):
        args = (tabs, carry, jnp.asarray(b_of_e), jnp.asarray(ilab),
                jnp.asarray(ch_atom_f), jnp.asarray(do_c), jnp.asarray(nth),
                jnp.asarray(skip), jnp.asarray(nn), Eg, NBG, KE)
        seq = model.apply(params, *args,
                          method=lambda m, *a: m._decoder()._graft_rows(*a))
        vec = model.apply(
            params, *args,
            method=lambda m, *a: m._decoder()._graft_rows_vec(*a))
        names = ('a_av e_av e_bt e_nth e_bg in_g in_cnt out_g out_dst '
                 'out_cnt edge_cnt clist ccnt').split()
        for nm, s, v in zip(names, seq, vec):
            np.testing.assert_array_equal(
                np.asarray(s), np.asarray(v), err_msg=f'{name}: {nm}')
        return seq

    # trackable motifs with at least one bond, varied sizes
    n_at = np.asarray(tabs['n_at'])
    nbond = np.asarray(tabs['nbond'])
    ok = (~np.asarray(tabs['poison'])) & (nbond > 0) & (n_at <= S)
    pool = np.flatnonzero(ok)
    assert len(pool) >= 3, 'vocab too small for the graft property test'

    # ---- root grafts ----------------------------------------------------
    root_icls = pool[rng.integers(0, len(pool), B)].astype(np.int32)
    sidxS = np.arange(S)[None, :]
    root_valid = sidxS < n_at[root_icls][:, None]
    root_atom_f = np.where(root_valid, 1 + b_of_a[:, None] + sidxS,
                           0).astype(np.int32)
    a_av0 = np.zeros(1 + B * A, np.int32)
    av_tab = np.asarray(tabs['av'])
    for b in range(B):
        a_av0[root_atom_f[b][root_valid[b]]] = \
            av_tab[root_icls[b]][root_valid[b]]
    carry = (jnp.asarray(a_av0),
             jnp.zeros(1 + B * Eg, jnp.int32),
             jnp.zeros(1 + B * Eg, jnp.int32),
             jnp.zeros(1 + B * Eg, jnp.int32),
             jnp.zeros((1 + B * Eg, NBG), jnp.int32),
             jnp.zeros((1 + B * A, NBG), jnp.int32),
             jnp.zeros(1 + B * A, jnp.int32),
             jnp.zeros((1 + B * A, NBG), jnp.int32),
             jnp.zeros((1 + B * A, NBG), jnp.int32),
             jnp.zeros(1 + B * A, jnp.int32),
             jnp.zeros(B, jnp.int32),
             jnp.zeros((B, n_nodes, KE), jnp.int32),
             jnp.zeros((B, n_nodes), jnp.int32))
    root_do_c = np.array([True, True, True, True, False])
    carry = run('root', carry, root_icls, root_atom_f, root_do_c,
                np.zeros(B, np.int32), np.zeros(B, bool),
                np.zeros(B, np.int32))
    atom_cnt = np.where(root_do_c, n_at[root_icls], 0).astype(np.int32)

    # ---- chained child grafts -------------------------------------------
    bpack = np.asarray(tabs['bpack'])
    bonds_np = np.asarray(tabs['bondpack'])
    for step in range(1, 5):
        ilab = pool[rng.integers(0, len(pool), B)].astype(np.int32)
        bp = bpack[ilab]
        isz2 = bp[:, 1] >= 2
        # attach endpoints alias EXISTING atoms (root atoms 0/1)
        paA = (1 + b_of_a).astype(np.int32)
        paB = (2 + b_of_a).astype(np.int32)
        ch_ap = bp[:, 5:7]
        ch_new = np.minimum(atom_cnt[:, None] +
                            bp[:, 8 + 2 * S:8 + 3 * S], A - 1)
        ch_atom = np.where(sidxS == ch_ap[:, 0:1], (paA - 1 - b_of_a)[:, None],
                           np.where(isz2[:, None] & (sidxS == ch_ap[:, 1:2]),
                                    (paB - 1 - b_of_a)[:, None], ch_new))
        ch_valid = sidxS < bp[:, 0:1]
        ch_atom_f = np.where(ch_valid, 1 + b_of_a[:, None] + ch_atom,
                             0).astype(np.int32)
        do_c = (rng.random(B) < 0.8) & root_do_c
        # keep within budgets so clip paths (undefined duplicate order)
        # never engage: real states can't exceed NBG rows per atom (valence
        # <= 6) and the scan's ovf guard poisons oversize grafts anyway
        deg0 = ((bonds_np[ilab][..., 0] == ch_ap[:, 0:1]) |
                (bonds_np[ilab][..., 1] == ch_ap[:, 0:1])).sum(1)
        deg1 = ((bonds_np[ilab][..., 0] == ch_ap[:, 1:2]) |
                (bonds_np[ilab][..., 1] == ch_ap[:, 1:2])).sum(1)
        in_c = np.asarray(carry[6])
        ok_nbg = (in_c[paA] + deg0 < NBG) & \
            (~isz2 | (in_c[paB] + deg1 < NBG))
        do_c &= ok_nbg
        need_e = 2 * nbond[ilab]
        ec = np.asarray(carry[10])
        do_c &= (ec + need_e <= Eg - 8)
        skip = isz2 & (rng.random(B) < 0.5) & (step > 1)
        nth = rng.integers(0, 5, B).astype(np.int32)
        nn = np.full(B, min(step, n_nodes - 1), np.int32)
        # seed a_av for the child's new atoms (caller contract)
        a_av = np.asarray(carry[0]).copy()
        bfv_new = bp[:, 8 + 4 * S:8 + 5 * S]
        wmask = (do_c[:, None] & ch_valid &
                 ~bp[:, 8 + 3 * S:8 + 4 * S].astype(bool))
        a_av[np.where(wmask, ch_atom_f, 0)] = np.where(
            wmask, bfv_new, a_av[np.where(wmask, ch_atom_f, 0)])
        a_av[0] = 0
        carry = (jnp.asarray(a_av),) + tuple(carry[1:])
        carry = run(f'child{step}', carry, ilab, ch_atom_f, do_c, nth,
                    skip, nn)
        n_new = np.maximum(bp[:, 0] - 1 - isz2.astype(np.int32), 0)
        atom_cnt = atom_cnt + np.where(do_c, n_new, 0)
