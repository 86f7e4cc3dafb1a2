"""Data-parallel tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from ggpm_tpu.data.batching import to_model_batch
from ggpm_tpu.parallel.mesh import (make_dp_train_step, make_mesh,
                                    shard_model_batches, stack_batches)
from ggpm_tpu.train.optim import make_optimizer


def test_virtual_devices():
    assert len(jax.devices()) == 8


def test_dp_step_runs_and_agrees(tiny_model_setup):
    """DP over 8 identical batches must equal a single-device step on one
    batch (grad mean of identical grads == the grad)."""
    st = tiny_model_setup
    model, vocab = st['model'], st['vocab']
    batch = to_model_batch(st['batches'][0], vocab.mask, pad=False)
    mesh = make_mesh(8)
    opt = make_optimizer(lr=1e-3, steps_per_epoch=10)
    rng = jax.random.PRNGKey(0)

    params = st['params']
    opt_state = opt.init(params)
    dp_step = make_dp_train_step(model, opt, mesh, beta=0.01)
    stacked = shard_model_batches([batch] * 8, mesh)
    # NOTE: per-device rng is folded with axis index, so device losses differ
    # through the sampled epsilon; run with perturb off for exact agreement.
    dp_step_det = make_dp_train_step(model, opt, mesh, beta=0.01,
                                     perturb_z=False)
    p1, o1, metrics, aux = dp_step_det(jax.tree.map(jnp.array, params),
                                       opt_state, stacked, rng)
    assert np.isfinite(float(metrics['Loss']))

    # gradient agreement: mean DP gradient over 8 identical shards must equal
    # the single-device gradient (Adam amplifies float32 psum-order noise on
    # near-zero entries, so compare gradients, not post-update params)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    rep, dev = P(), P('data')

    def local_loss(p, b, r):
        local = jax.tree.map(lambda x: x[0], {k: v for k, v in b.items()
                                              if k != 'vocab_mask'})
        local['vocab_mask'] = b['vocab_mask']
        loss, _, _ = model.apply(p, local, 0.01, r, False, False,
                                 rngs={'dropout': jax.random.fold_in(r, 1)})
        return jax.lax.pmean(loss, 'data')

    spec = {k: (rep if k == 'vocab_mask' else jax.tree.map(lambda _: dev, v))
            for k, v in stacked.items()}
    # check_vma=False for the same reason as make_dp_train_step: the
    # transpose-table gathers are custom_vjp, which defeats static VMA
    # inference — the agreement assertion below IS the numerics check.
    sharded = shard_map(local_loss, mesh=mesh, in_specs=(rep, spec, rep),
                        out_specs=rep, check_vma=False)
    g_dp = jax.grad(lambda p: sharded(p, stacked, rng))(params)

    def loss_fn(p):
        loss, m, _ = model.apply(p, jax.tree.map(jnp.asarray, batch), 0.01,
                                 rng, False, False,
                                 rngs={'dropout': jax.random.fold_in(rng, 1)})
        return loss
    g_single = jax.grad(loss_fn)(params)

    for a, b in zip(jax.tree.leaves(g_dp), jax.tree.leaves(g_single)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_stack_batches_shapes(tiny_model_setup):
    st = tiny_model_setup
    batch = to_model_batch(st['batches'][0], st['vocab'].mask, pad=False)
    stacked = stack_batches([batch] * 4)
    assert stacked['tree']['fnode'].shape[0] == 4
    assert stacked['vocab_mask'].ndim == 2  # replicated, not stacked


def test_dp_step_hier_model(tiny_model_setup):
    """DP step also runs for the hierarchical model family."""
    import copy
    from ggpm_tpu.models.vae import HierPropertyVAE
    st = tiny_model_setup
    cfg = copy.copy(st['cfg'])
    cfg.depthG = 2
    cfg.diterG = 1
    model = HierPropertyVAE(cfg=cfg)
    batch = to_model_batch(st['batches'][0], st['vocab'].mask, pad=False)
    mesh = make_mesh(8)
    opt = make_optimizer(lr=1e-3, steps_per_epoch=10)
    rng = jax.random.PRNGKey(0)
    params = model.init({'params': rng, 'dropout': rng},
                        jax.tree.map(jnp.asarray, batch), 0.1, rng, True, False)
    opt_state = opt.init(params)
    step = make_dp_train_step(model, opt, mesh, beta=0.1)
    stacked = shard_model_batches([batch] * 8, mesh)
    params, opt_state, metrics, aux = step(params, opt_state, stacked, rng)
    assert np.isfinite(float(metrics['Loss']))


def test_gspmd_dp_tp_step(tiny_model_setup):
    """Combined DP + vocab-dim TP on a 4x2 (data x model) mesh: the step
    runs, at least one vocab-dimension parameter is genuinely sharded over
    the model axis, and the gradient agrees with single-device."""
    from ggpm_tpu.parallel.mesh import (make_gspmd_train_step, make_mesh_2d,
                                        param_partition_spec, stack_batches)
    from jax.sharding import PartitionSpec as P

    st = tiny_model_setup
    model, vocab = st['model'], st['vocab']
    batch = to_model_batch(st['batches'][0], vocab.mask, pad=False)
    mesh = make_mesh_2d(4, 2)
    opt = make_optimizer(lr=1e-3, steps_per_epoch=10)
    rng = jax.random.PRNGKey(3)
    params = jax.tree.map(jnp.array, st['params'])
    opt_state = opt.init(params)

    # the tiny fixture's vocab is small — lower the TP threshold so its
    # embeddings/heads shard
    pspec = param_partition_spec(params, min_dim=8)
    sharded_specs = [s for s in jax.tree.leaves(
        pspec, is_leaf=lambda x: isinstance(x, P)) if s != P()]
    assert sharded_specs, 'no vocab-dim parameter matched the TP rules'

    # single-device loss FIRST: place() may alias buffers on a CPU mesh and
    # the step donates its inputs, deleting them
    def loss_fn(pp):
        k = jax.random.split(rng, 4)[0]
        loss, _, _ = model.apply(pp, jax.tree.map(jnp.asarray, batch), 0.01,
                                 k, False, False,
                                 rngs={'dropout': jax.random.fold_in(k, 1)})
        return loss
    single = float(loss_fn(params))

    step, place = make_gspmd_train_step(model, opt, mesh, beta=0.01,
                                        perturb_z=False, tp_min_dim=8)
    stacked = stack_batches([batch] * 4)
    p, o, s = place(params, opt_state, stacked)
    assert any('model' in str(x.sharding.spec) for x in jax.tree.leaves(p))

    p2, o2, metrics, aux = step(p, o, s, rng)
    # per-device rngs differ from the single-device key only through the
    # (disabled) latent perturbation, so the mean loss over identical
    # shards must match a single shard's loss
    np.testing.assert_allclose(float(metrics['Loss']), single, rtol=1e-4)
    assert any('model' in str(x.sharding.spec) for x in jax.tree.leaves(p2))


def test_train_epoch_dp_consumes_whole_flush(tiny_model_setup):
    """A bucket flush carries up to scan_chunk batches; the DP path must
    train on ALL of them in n_shards-sized groups, not just the first
    n_shards (regression: 75% of the data was silently dropped at
    n_shards=2, scan_chunk=8)."""
    from ggpm_tpu.train.loop import Trainer
    st = tiny_model_setup
    mesh = make_mesh(2)
    opt = make_optimizer(lr=1e-3, steps_per_epoch=10)
    tr = Trainer(st['model'], opt, st['vocab'].mask, beta=0.01,
                 print_iter=10 ** 9, mesh=mesh)
    params, opt_state = tr.init(st['batches'][0])
    calls = []
    orig = tr.dp_step

    def counting(p, o, dbl, *a, **k):
        calls.append(len(dbl))
        return orig(p, o, dbl, *a, **k)
    tr.dp_step = counting
    data = [st['batches'][0]] * 8        # one flush of 8 same-shape batches
    mols0 = tr.mols_seen
    tr.train_epoch(params, opt_state, data, scan_chunk=8)
    assert calls == [2, 2, 2, 2], calls  # 4 groups of n_shards=2
    n_mols = len(st['batches'][0].smiles)
    assert tr.mols_seen - mols0 == 8 * n_mols
