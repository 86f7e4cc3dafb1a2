"""Training-stack tests: loss decreases, checkpoint round-trip, weight
transfer, early stopping, multi-optimizer."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggpm_tpu.train import checkpoint as ckpt
from ggpm_tpu.train.optim import default_group_fn, make_multi_optimizer


def test_loss_decreases(tiny_model_setup):
    st = tiny_model_setup
    m = st['trainer'].evaluate(st['params'], st['batches'])
    # after the fixture's short training run, loss must be well below the
    # untrained level (~70 on this data)
    assert m['Loss'] < 25, m


def test_checkpoint_roundtrip(tiny_model_setup, tmp_path):
    st = tiny_model_setup
    path = str(tmp_path / 'model.ckpt')
    ckpt.save_params(st['params'], path)
    loaded = ckpt.load_params(st['params'], path)
    for a, b in zip(jax.tree.leaves(st['params']), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_copy_encoder_transfer(tiny_model_setup):
    """Pretrain→fine-tune: PropOptVAE receives PropertyVAE encoder weights
    (reference copy_encoder, nnutils.py:45-62)."""
    from ggpm_tpu.data.batching import to_model_batch
    from ggpm_tpu.models.vae import PropOptVAE
    st = tiny_model_setup
    batch = jax.tree.map(jnp.asarray, to_model_batch(
        st['batches'][0], st['vocab'].mask, pad=False))
    rng = jax.random.PRNGKey(7)
    ft_model = PropOptVAE(cfg=st['cfg'])
    ft_params = ft_model.init({'params': rng, 'dropout': rng}, batch,
                              0.1, rng, True, True)
    merged, n = ckpt.copy_encoder(ft_params, st['params'])
    assert n > 0
    # encoder weights equal source, property head untouched
    flat_src = ckpt._flat(st['params'])
    flat_dst = ckpt._flat(merged)
    src_by_str = {'/'.join(map(str, k)): v for k, v in flat_src.items()}
    hits = 0
    for k, v in flat_dst.items():
        ks = '/'.join(map(str, k))
        if 'encoder' in ks:
            src = src_by_str.get(ks.replace('vae/', '', 1))
            if src is not None and np.shape(src) == np.shape(v):
                np.testing.assert_array_equal(np.asarray(v), np.asarray(src))
                hits += 1
    assert hits > 0


def test_copy_matching_full_transfer(tiny_model_setup):
    from ggpm_tpu.data.batching import to_model_batch
    from ggpm_tpu.models.vae import PropOptVAE
    st = tiny_model_setup
    batch = jax.tree.map(jnp.asarray, to_model_batch(
        st['batches'][0], st['vocab'].mask, pad=False))
    rng = jax.random.PRNGKey(7)
    ft_model = PropOptVAE(cfg=st['cfg'])
    ft_params = ft_model.init({'params': rng, 'dropout': rng}, batch,
                              0.1, rng, True, True)
    merged, n = ckpt.copy_matching(ft_params, st['params'],
                                   prefix_map={'params/vae/': 'params/'})
    n_src = len(ckpt._flat(st['params']))
    assert n >= n_src * 0.9  # nearly all pretrain weights land


def test_early_stopping(tmp_path):
    es = ckpt.EarlyStopping(patience=2, path=str(tmp_path / 'best'))
    params = {'w': np.zeros(3)}
    for loss in [1.0, 0.5, 0.6, 0.7, 0.8]:
        es(loss, params)
    assert es.early_stop
    assert os.path.exists(str(tmp_path / 'best'))
    assert es.val_loss_min == 0.5


def test_multi_optimizer_groups():
    params = {'params': {'vae': {'encoder': {'w': jnp.ones(2)},
                                 'decoder': {'w': jnp.ones(2)}},
                         'property_optim': {'homo_linear': {'w': jnp.ones(2)},
                                            'lumo_linear': {'w': jnp.ones(2)}}}}
    opt = make_multi_optimizer(default_group_fn,
                               {'encoder': 1e-3, 'decoder': 1e-2,
                                'homo': 1e-4, 'lumo': 1e-4},
                               steps_per_epoch=10)
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    flat = jax.tree_util.tree_flatten_with_path(updates)[0]
    mags = {jax.tree_util.keystr(p): float(np.abs(v).mean()) for p, v in flat}
    enc = next(v for k, v in mags.items() if 'encoder' in k)
    dec = next(v for k, v in mags.items() if 'decoder' in k)
    assert dec > enc * 5  # decoder lr 10× encoder lr


def test_lr_schedule():
    from ggpm_tpu.train.optim import make_lr_schedule
    sched = make_lr_schedule(1e-3, 0.9, steps_per_epoch=100)
    assert sched(0) == pytest.approx(1e-3)
    assert sched(100) == pytest.approx(9e-4)
    assert sched(250) == pytest.approx(1e-3 * 0.81)


def test_orbax_checkpoint_roundtrip(tiny_model_setup, tmp_path):
    st = tiny_model_setup
    path = str(tmp_path / 'orbax_ckpt')
    ckpt.save_params_orbax(st['params'], path)
    loaded = ckpt.load_params_orbax(st['params'], path)
    for a, b in zip(jax.tree.leaves(st['params']), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_throughput_meter():
    from ggpm_tpu.train.profiling import Throughput, param_norm
    m = Throughput()
    m.update(20)
    m.update(20)
    r = m.rates()
    assert r['mols_per_sec'] > 0 and r['steps_per_sec'] > 0
    assert param_norm({'w': jnp.ones(4)}) == 2.0


def test_scan_steps_matches_sequential(tiny_model_setup):
    """K steps under one lax.scan device call must reproduce K sequential
    train_step calls bit-for-bit (same on-device PRNG split chain)."""
    from collections import Counter

    import jax
    import jax.numpy as jnp

    from ggpm_tpu.models.vae import PropertyVAE
    from ggpm_tpu.train.loop import Trainer, stack_batches
    from ggpm_tpu.train.optim import make_optimizer

    st = tiny_model_setup
    vocab = st['vocab']

    def make():
        model = PropertyVAE(cfg=st['cfg'])
        opt = make_optimizer(lr=1e-3, steps_per_epoch=3)
        tr = Trainer(model, opt, vocab.mask, beta=0.1, print_iter=10 ** 9,
                     seed=11)
        p, o = tr.init(st['batches'][0])
        dev = [tr._device_batch(mb) for mb in st['batches']]
        sig = lambda db: tuple(l.shape for l in jax.tree.leaves(db))
        common, _ = Counter(sig(db) for db in dev).most_common(1)[0]
        return tr, p, o, [db for db in dev if sig(db) == common]

    tr1, p1, o1, dev1 = make()
    assert len(dev1) >= 2
    for db in dev1:
        p1, o1, _, _ = tr1.train_step(p1, o1, db)

    tr2, p2, o2, dev2 = make()
    p2, o2, ms, _ = tr2.scan_steps(p2, o2, stack_batches(dev2))
    assert ms['Loss'].shape[0] == len(dev2)
    mx = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), p1, p2)))
    assert mx < 1e-6
    assert tr2.total_step == len(dev2)


def test_flat_optimizer_matches_per_leaf(tiny_model_setup):
    """optax.flatten(make_optimizer(...)) produces the same training
    trajectory as the per-leaf chain (up to float reduction order in the
    global-norm clip) — the flat form exists because the step is op-count
    bound on TPU (runs/STEP_OVERHEAD*.json)."""
    import jax
    import jax.numpy as jnp
    from ggpm_tpu.train.loop import Trainer
    from ggpm_tpu.train.optim import make_optimizer
    st = tiny_model_setup

    def run(flatten):
        model = st['model']
        opt = make_optimizer(lr=2e-3, clip_norm=20.0, anneal_rate=0.9,
                             steps_per_epoch=3, flatten=flatten)
        tr = Trainer(model, opt, st['vocab'].mask, beta=0.1,
                     print_iter=10 ** 9, seed=17)
        p, o = tr.init(st['batches'][0])
        for mb in st['batches']:
            p, o, _, _ = tr.train_step(p, o, tr._device_batch(mb))
        return p

    p_leaf = run(False)
    p_flat = run(True)
    mx = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), p_leaf, p_flat)))
    assert mx < 5e-5, mx
