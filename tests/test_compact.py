"""Lane-packed decode plans (batching.compact_plan_dict).

The teacher-forcing decoder scan executes every padded [T, B] slot; packing
DFS chains onto fewer lanes re-schedules the same loss terms onto a smaller
[T', L] grid.  These tests pin the invariant: identical loss, metrics and
per-sample partition vs the unpacked plan (reference semantics:
/root/reference/ggpm/decoder.py:776-899 sum_forward over per-sample DFS
orders — packing only changes which (step, lane) slot computes each term).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggpm_tpu.data.batching import (compact_plan_dict, _PLAN_STEP_KEYS,
                                    to_model_batch)
from ggpm_tpu.graph.mol_graph import MolGraph, tensorize
from ggpm_tpu.graph.vocab import common_atom_vocab
from ggpm_tpu.models.decoder import MotifDecoder
from ggpm_tpu.models.vae import ModelConfig, PropertyVAE


@pytest.fixture(scope='module')
def batch_and_cfg(golden_smiles, golden_vocab):
    MolGraph.FRAGMENTS = set()
    mb = tensorize([[s, -5.0, 1.0] for s in golden_smiles[:6]],
                   golden_vocab, common_atom_vocab)
    batch = jax.tree.map(jnp.asarray,
                         to_model_batch(mb, golden_vocab.mask, pad=True))
    cfg = ModelConfig(hvocab_size=golden_vocab.size()[0],
                      ivocab_size=golden_vocab.size()[1],
                      hidden_size=48, embed_size=48, latent_size=24,
                      depthT=3, depthG=3, diterT=1)
    return batch, cfg


def _np_plan(plan):
    return {k: np.asarray(v) for k, v in plan.items()}


def test_compact_preserves_chains(batch_and_cfg):
    """Every molecule's active-slot sequence survives packing in order."""
    batch, _ = batch_and_cfg
    plan = _np_plan(batch['plan'])
    out = compact_plan_dict(plan)
    act, act2 = plan['active'], out['active']
    assert act2.sum() == act.sum()
    # never larger than the padded grid (the 16-lane/32-step quanta keep
    # tiny batches at parity; see test_compact_shrinks_large_batch)
    assert act2.size <= act.size
    ml = out['mol_lane']
    B = act.shape[1]
    for m in range(B):
        src_t = np.flatnonzero(act[:, m])
        dst = np.argwhere((ml == m) & (act2 > 0))
        # time-major argwhere order == packing order (chains are contiguous
        # within a lane and lanes never interleave one molecule)
        assert len(dst) == len(src_t)
        for key in _PLAN_STEP_KEYS:
            a, b = plan[key], out[key]
            np.testing.assert_array_equal(
                a[src_t, m], b[dst[:, 0], dst[:, 1]], err_msg=key)


def test_compact_shrinks_large_batch():
    """At realistic batch (length spread ~3×, padded T = max chain) packing
    recovers most of the idle slots."""
    rng = np.random.RandomState(0)
    B, T = 120, 96
    lens = rng.randint(16, 97, size=B)
    act = np.zeros((T, B), bool)
    for m, k in enumerate(lens):
        act[:k, m] = True
    plan = {k: np.zeros((T, B), np.int32) for k in _PLAN_STEP_KEYS}
    plan['assm_icls'] = np.zeros((T, B, 2), np.int32)
    plan['active'] = act
    # give each slot a unique payload so relocation errors are visible
    plan['xid'] = (np.arange(T * B, dtype=np.int32).reshape(T, B) + 1) * act
    plan['root_clab'] = np.zeros(B, np.int32)
    plan['root_ilab'] = np.zeros(B, np.int32)
    plan['max_cls_size'] = np.asarray(8, np.int32)
    out = compact_plan_dict(plan)
    assert out['active'].sum() == act.sum()
    util = act.sum() / out['active'].size
    assert out['active'].size <= 0.75 * act.size
    assert util > 0.6
    for m in range(B):
        got = out['xid'][(out['mol_lane'] == m) & out['active']]
        np.testing.assert_array_equal(got, plan['xid'][act[:, m], m])


def test_compact_empty_plan():
    plan = {k: np.zeros((4, 3), np.int32) for k in _PLAN_STEP_KEYS}
    plan['assm_icls'] = np.zeros((4, 3, 2), np.int32)
    plan['root_clab'] = np.zeros(3, np.int32)
    plan['root_ilab'] = np.zeros(3, np.int32)
    plan['max_cls_size'] = np.asarray(8, np.int32)
    out = compact_plan_dict(plan)
    assert out['active'].sum() == 0
    assert (out['assm_n_icls'] >= 1).all()


def _decoder_and_params(batch, cfg, use_attention=False, src_mem=None):
    tree, plan = batch['tree'], batch['plan']
    dec = MotifDecoder(hvocab_size=cfg.hvocab_size,
                       ivocab_size=cfg.ivocab_size,
                       atom_vocab_size=cfg.atom_vocab_size,
                       embed_size=48, hidden_size=48, latent_size=24,
                       use_attention=use_attention)
    rng = jax.random.PRNGKey(0)
    B = tree['scope'].shape[0]
    root_vecs = jax.random.normal(rng, (B, 24))
    params = dec.init({'params': rng, 'dropout': rng}, tree, plan,
                      root_vecs, batch['vocab_mask'], src_mem=src_mem)
    return dec, params, root_vecs


def test_compact_loss_equivalence(batch_and_cfg):
    batch, cfg = batch_and_cfg
    tree, plan = batch['tree'], batch['plan']
    dec, params, root_vecs = _decoder_and_params(batch, cfg)
    cplan = compact_plan_dict(_np_plan(plan))
    loss, metrics = dec.apply(params, tree, plan, root_vecs,
                              batch['vocab_mask'])
    closs, cmetrics = dec.apply(params, tree, cplan, root_vecs,
                                batch['vocab_mask'])
    np.testing.assert_allclose(float(loss), float(closs), rtol=2e-5)
    for k in metrics:
        np.testing.assert_allclose(float(metrics[k]), float(cmetrics[k]),
                                   rtol=2e-5, err_msg=k)


def test_compact_grad_equivalence(batch_and_cfg):
    """Gradients, not just the loss, survive packing (the scan state updates
    and every loss-head gather must see identical operands)."""
    batch, cfg = batch_and_cfg
    tree, plan = batch['tree'], batch['plan']
    dec, params, root_vecs = _decoder_and_params(batch, cfg)
    cplan = compact_plan_dict(_np_plan(plan))

    def lf(p, pl):
        return dec.apply(p, tree, pl, root_vecs, batch['vocab_mask'])[0]

    g1 = jax.grad(lf)(params, plan)
    g2 = jax.grad(lf)(params, cplan)
    for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_flatten_with_path(g1)[0],
            jax.tree_util.tree_flatten_with_path(g2)[0]):
        assert jax.tree_util.keystr(k1) == jax.tree_util.keystr(k2)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6,
                                   err_msg=jax.tree_util.keystr(k1))


def test_compact_attention_equivalence(batch_and_cfg):
    batch, cfg = batch_and_cfg
    tree, plan = batch['tree'], batch['plan']
    src_mem = jax.random.normal(jax.random.PRNGKey(3),
                                (tree['fnode'].shape[0], 24))
    dec, params, root_vecs = _decoder_and_params(batch, cfg,
                                                 use_attention=True,
                                                 src_mem=src_mem)
    cplan = compact_plan_dict(_np_plan(plan))
    loss, _ = dec.apply(params, tree, plan, root_vecs, batch['vocab_mask'],
                        src_mem=src_mem)
    closs, _ = dec.apply(params, tree, cplan, root_vecs,
                         batch['vocab_mask'], src_mem=src_mem)
    np.testing.assert_allclose(float(loss), float(closs), rtol=2e-5)


def test_compact_per_sample_partition(batch_and_cfg):
    """mean_forward's per-sample breakdown becomes a segment-sum over
    mol_lane — must match the unpacked per-sample losses exactly."""
    batch, cfg = batch_and_cfg
    tree, plan = batch['tree'], batch['plan']
    dec, params, root_vecs = _decoder_and_params(batch, cfg)
    cplan = compact_plan_dict(_np_plan(plan))
    _, _, ps = dec.apply(params, tree, plan, root_vecs, batch['vocab_mask'],
                         method=MotifDecoder.mean_forward)
    _, _, cps = dec.apply(params, tree, cplan, root_vecs,
                          batch['vocab_mask'],
                          method=MotifDecoder.mean_forward)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(cps), rtol=2e-5)


def test_compact_scheduled_forward_runs(batch_and_cfg):
    """scheduled_forward on a packed plan: per-slot coins now land on the
    packed grid (different RNG stream than unpacked — not bit-comparable),
    but the tf_ratio=1 limit is exact teacher forcing on both layouts."""
    batch, cfg = batch_and_cfg
    tree, plan = batch['tree'], batch['plan']
    dec, params, root_vecs = _decoder_and_params(batch, cfg)
    cplan = compact_plan_dict(_np_plan(plan))
    r = jax.random.PRNGKey(7)
    loss, _ = dec.apply(params, tree, plan, root_vecs, batch['vocab_mask'],
                        1.0, r, method=MotifDecoder.scheduled_forward)
    closs, _ = dec.apply(params, tree, cplan, root_vecs,
                         batch['vocab_mask'], 1.0, r,
                         method=MotifDecoder.scheduled_forward)
    np.testing.assert_allclose(float(loss), float(closs), rtol=2e-5)


def test_trainer_compacts_motif_family(batch_and_cfg, golden_smiles,
                                       golden_vocab):
    """Trainer defaults: packing on for the motif family, off for hier; a
    packed training step runs and the packed plan reaches the device."""
    import optax
    from ggpm_tpu.train.loop import Trainer
    batch, cfg = batch_and_cfg
    model = PropertyVAE(cfg=cfg)
    tr = Trainer(model, optax.adam(1e-3), golden_vocab.mask)
    assert tr.compact_plans is True
    from ggpm_tpu.models.vae import HierPropertyVAE
    tr_h = Trainer(HierPropertyVAE(cfg=cfg), optax.adam(1e-3),
                   golden_vocab.mask)
    assert tr_h.compact_plans is False

    db = tr._device_batch({k: v for k, v in batch.items()})
    assert 'mol_lane' in db['plan']
    assert 'gstep_nodes' not in db['plan']
    params, opt_state = tr.init(batch)
    params, opt_state, metrics, _ = tr.train_step(params, opt_state, db)
    assert np.isfinite(float(np.asarray(metrics['Loss'])))
