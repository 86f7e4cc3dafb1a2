"""Model tests: forward/grad health, determinism, all four registry models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggpm_tpu.data.batching import to_model_batch
from ggpm_tpu.graph.mol_graph import MolGraph, tensorize
from ggpm_tpu.graph.vocab import common_atom_vocab
from ggpm_tpu.models.vae import (ModelConfig, OPVNet, PropertyVAE,
                                 PropOptVAE)


@pytest.fixture(scope='module')
def batch_and_cfg(golden_smiles, golden_vocab):
    MolGraph.FRAGMENTS = set()
    mb = tensorize([[s, -5.0, 1.0] for s in golden_smiles[:6]],
                   golden_vocab, common_atom_vocab)
    batch = jax.tree.map(jnp.asarray,
                         to_model_batch(mb, golden_vocab.mask, pad=False))
    cfg = ModelConfig(hvocab_size=golden_vocab.size()[0],
                      ivocab_size=golden_vocab.size()[1],
                      hidden_size=48, embed_size=48, latent_size=24,
                      depthT=3, depthG=3, diterT=1)
    return batch, cfg


@pytest.mark.parametrize('name', ['prop', 'prop-opt', 'hier-prop', 'hier-prop-opt'])
def test_all_models_forward_and_grad(name, batch_and_cfg):
    batch, cfg = batch_and_cfg
    model = OPVNet.get_model(name)(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init({'params': rng, 'dropout': rng}, batch, 0.1, rng, True, True)
    loss, metrics, aux = model.apply(params, batch, 0.1, rng, True, True)
    assert np.isfinite(float(loss))
    for k in ('Word', 'I-Word', 'Topo', 'Assm', 'Loss', 'KL'):
        assert k in metrics

    g = jax.grad(lambda p: model.apply(p, batch, 0.1, rng, True, True)[0])(params)
    gn = sum(float((x ** 2).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_registry_unknown():
    with pytest.raises(ValueError):
        OPVNet.get_model('nope')


def test_forward_deterministic(batch_and_cfg):
    batch, cfg = batch_and_cfg
    model = PropertyVAE(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init({'params': rng, 'dropout': rng}, batch, 0.1, rng, True, True)
    l1, _, _ = model.apply(params, batch, 0.1, rng, False, True)
    l2, _, _ = model.apply(params, batch, 0.1, rng, False, True)
    assert float(l1) == float(l2)


def test_perturb_changes_loss(batch_and_cfg):
    batch, cfg = batch_and_cfg
    model = PropertyVAE(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init({'params': rng, 'dropout': rng}, batch, 0.1, rng, True, True)
    l1, _, _ = model.apply(params, batch, 0.1, jax.random.PRNGKey(1), True, True)
    l2, _, _ = model.apply(params, batch, 0.1, jax.random.PRNGKey(2), True, True)
    assert float(l1) != float(l2)


def test_tie_embedding_shares_params(batch_and_cfg):
    batch, cfg = batch_and_cfg
    import copy
    cfg_tied = copy.copy(cfg)
    cfg_tied.tie_embedding = True
    cfg_untied = copy.copy(cfg)
    cfg_untied.tie_embedding = False
    rng = jax.random.PRNGKey(0)
    p_tied = PropertyVAE(cfg=cfg_tied).init(
        {'params': rng, 'dropout': rng}, batch, 0.1, rng, True, True)
    p_untied = PropertyVAE(cfg=cfg_untied).init(
        {'params': rng, 'dropout': rng}, batch, 0.1, rng, True, True)
    n_tied = sum(x.size for x in jax.tree.leaves(p_tied))
    n_untied = sum(x.size for x in jax.tree.leaves(p_untied))
    assert n_untied > n_tied  # untied has separate E_c/E_i per side


def test_property_heads(batch_and_cfg):
    batch, cfg = batch_and_cfg
    model = PropOptVAE(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init({'params': rng, 'dropout': rng}, batch, 0.1, rng, True, True)
    z = jnp.zeros((4, cfg.latent_size))
    h, l = model.apply(params, z, method=lambda m, zz: m.predict_properties(zz))
    assert h.shape == (4,) and l.shape == (4,)


def test_loss_weigh():
    from ggpm_tpu.models.heads import LossWeigh
    lw = LossWeigh()
    rng = jax.random.PRNGKey(0)
    params = lw.init(rng, jnp.array(1.0), jnp.array(2.0), jnp.array(3.0))
    r, h, l = lw.apply(params, jnp.array(1.0), jnp.array(2.0), jnp.array(3.0))
    # with zero log-vars the scaled losses equal the inputs
    assert float(r) == 1.0 and float(h) == 2.0 and float(l) == 3.0


def test_model_api_reconstruct_sample(tiny_model_setup):
    """Model-level convenience API (reference reconstruct/sample surface)."""
    from ggpm_tpu.models.api import reconstruct, sample
    st = tiny_model_setup
    props, (results, smiles) = reconstruct(
        st['model'], st['params'], st['batches'][0], st['vocab'],
        max_decode_step=30)
    assert props is None  # plain PropertyVAE has no heads
    assert len(smiles) == len(st['batches'][0].smiles)
    _, s2 = sample(st['model'], st['params'], st['vocab'], 4,
                   max_decode_step=20, log_steps=False)
    assert len(s2) == 4


def test_scheduled_tf1_matches_standard(tiny_model_setup):
    """With teacher-forcing ratio 1.0 the scheduled decoder must reproduce
    the standard teacher-forced loss exactly (no coins land)."""
    from ggpm_tpu.data.batching import to_model_batch
    st = tiny_model_setup
    model, params, vocab = st['model'], st['params'], st['vocab']
    batch = jax.tree.map(jnp.asarray,
                         to_model_batch(st['batches'][0], vocab.mask, pad=False))
    rng = jax.random.PRNGKey(3)

    std_loss, _ = model.apply(
        params, batch['tree'], batch['plan'],
        jnp.zeros((len(st['batches'][0].smiles), st['cfg'].latent_size)),
        batch['vocab_mask'], True,
        method=lambda m, *a: m._decoder()(*a))
    sched_loss, _ = model.apply(
        params, batch['tree'], batch['plan'],
        jnp.zeros((len(st['batches'][0].smiles), st['cfg'].latent_size)),
        batch['vocab_mask'], 1.0, rng, True,
        method=lambda m, *a: m._decoder().scheduled_forward(*a))
    np.testing.assert_allclose(float(std_loss), float(sched_loss), rtol=1e-5)


@pytest.mark.parametrize('name', ['prop', 'prop-opt', 'hier-prop', 'hier-prop-opt'])
def test_attention_variant(name, batch_and_cfg):
    """use_attention adds A_topo/A_cls/A_assm context heads (reference
    decoder.py:28,62-65,124-164) and the model still trains: loss finite,
    gradients flow through the attention heads."""
    import copy
    batch, cfg = batch_and_cfg
    cfg_att = copy.copy(cfg)
    cfg_att.use_attention = True
    model = OPVNet.get_model(name)(cfg=cfg_att)
    rng = jax.random.PRNGKey(0)
    params = model.init({'params': rng, 'dropout': rng}, batch, 0.1, rng,
                        True, True)
    names = [jax.tree_util.keystr(p)
             for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    for head in ('A_topo', 'A_cls', 'A_assm'):
        assert any(head in n for n in names), f'{head} missing from params'
    loss, metrics, _ = model.apply(params, batch, 0.1, rng, True, True)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: model.apply(p, batch, 0.1, rng, True, True)[0])(params)
    att_gn = sum(float((x ** 2).sum())
                 for p, x in jax.tree_util.tree_flatten_with_path(g)[0]
                 if 'A_topo' in jax.tree_util.keystr(p)
                 or 'A_cls' in jax.tree_util.keystr(p)
                 or 'A_assm' in jax.tree_util.keystr(p))
    assert np.isfinite(att_gn) and att_gn > 0


def test_reference_attention_config_loads(batch_and_cfg, golden_vocab):
    """The reference w_attention experiment config maps onto ModelConfig with
    the flag set (reference configs/pretrained_w_tie_embedding_w_attention_configs.json)."""
    import os
    path = ('/root/reference/configs/'
            'pretrained_w_tie_embedding_w_attention_configs.json')
    if not os.path.exists(path):
        pytest.skip('reference configs unavailable')
    from ggpm_tpu.configs import Configs
    cfgs = Configs(path=path)
    mc = ModelConfig.from_configs(cfgs, golden_vocab)
    assert mc.use_attention is True


def test_mean_forward_matches_sum(batch_and_cfg):
    """mean_forward (reference decoder.py:630-774, forward(avg_loss=True))
    returns the identical total loss as the sum path plus a per-sample
    breakdown that partitions it exactly."""
    from ggpm_tpu.models.decoder import MotifDecoder
    batch, cfg = batch_and_cfg
    tree, plan = batch['tree'], batch['plan']
    dec = MotifDecoder(hvocab_size=cfg.hvocab_size, ivocab_size=cfg.ivocab_size,
                       atom_vocab_size=cfg.atom_vocab_size,
                       embed_size=48, hidden_size=48, latent_size=24)
    rng = jax.random.PRNGKey(0)
    B = tree['scope'].shape[0]
    root_vecs = jax.random.normal(rng, (B, 24))
    params = dec.init({'params': rng, 'dropout': rng}, tree, plan, root_vecs,
                      batch['vocab_mask'])
    loss, metrics = dec.apply(params, tree, plan, root_vecs,
                              batch['vocab_mask'])
    mloss, mmetrics, per_sample = dec.apply(
        params, tree, plan, root_vecs, batch['vocab_mask'],
        method=MotifDecoder.mean_forward)
    assert per_sample.shape == (B,)
    np.testing.assert_allclose(float(loss), float(mloss), rtol=1e-5)
    np.testing.assert_allclose(float(per_sample.sum()) / B, float(loss),
                               rtol=1e-4)
    for k in metrics:
        np.testing.assert_allclose(float(metrics[k]), float(mmetrics[k]),
                                   rtol=1e-5)


@pytest.mark.parametrize('rnn_type', ['LSTM', 'GRU'])
def test_transpose_table_grads_exact(batch_and_cfg, rnn_type):
    """The transpose-table gather backward (ops.nei_sum_t/gather_nd_t) must
    match XLA's scatter-add VJP exactly at every call site: dropping the
    row-0/padding contributions from the table is gradient-exact because
    those cotangents are dead (see the note in ops/graph_ops.py)."""
    batch, cfg = batch_and_cfg
    cfg = ModelConfig(hvocab_size=cfg.hvocab_size, ivocab_size=cfg.ivocab_size,
                      rnn_type=rnn_type, hidden_size=48, embed_size=48,
                      latent_size=24, depthT=3, depthG=3, diterT=1)
    model = PropertyVAE(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init({'params': rng, 'dropout': rng}, batch, 0.1, rng,
                        True, True)

    def strip(b):
        out = dict(b)
        for lv in ('tree', 'graph'):
            out[lv] = {k: v for k, v in b[lv].items()
                       if k not in ('bgraph_t', 'bgraph_tm')}
        return out

    assert 'bgraph_t' in batch['tree'] and 'bgraph_t' in batch['graph']
    loss_fn = lambda p, b: model.apply(p, b, 0.1, rng, True, True)[0]
    lt, gt = jax.value_and_grad(loss_fn)(params, batch)
    ls, gs = jax.value_and_grad(loss_fn)(params, strip(batch))
    np.testing.assert_allclose(float(lt), float(ls), rtol=1e-6)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(gt)[0],
            jax.tree_util.tree_flatten_with_path(gs)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-6, err_msg=str(kp))
