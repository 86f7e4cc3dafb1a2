"""Device-mesh utilities and the data-parallel training step.

The reference is single-device (SURVEY.md §2.6: no torch.distributed anywhere)
— this module is the TPU-native scaling layer it lacks: a
``jax.sharding.Mesh`` over ICI, batch-axis sharding via ``shard_map``, and a
gradient ``psum`` as the only collective.  Graph tensors are flattened per
molecule-batch, so data parallelism stacks D independent padded batches on a
leading device axis; parameters are replicated.

Works identically on a real TPU slice and on a virtual CPU mesh
(``--xla_force_host_platform_device_count=N``) for testing.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = None, axis: str = 'data') -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def stack_batches(batches: Sequence[Dict]) -> Dict:
    """Stack D same-shape model batches along a new leading device axis.
    ``vocab_mask`` stays unstacked (replicated)."""
    out: Dict[str, Any] = {}
    first = batches[0]
    for key in first:
        if key == 'vocab_mask':
            out[key] = first[key]
            continue
        out[key] = jax.tree.map(lambda *xs: np.stack(xs), *[b[key] for b in batches])
    return out


def make_dp_train_step(model, optimizer, mesh: Mesh, beta: float = 0.1,
                       perturb_z: bool = True, axis: str = 'data') -> Callable:
    """Data-parallel step.

    The per-device loss is ``pmean``-reduced *inside* ``shard_map`` and the
    gradient is taken *through* it: the transpose of the replicated-params
    input then inserts exactly one cross-device ``psum`` of cotangents, which
    combined with the 1/D of the pmean yields the mean gradient.  (Taking
    ``jax.grad`` inside the body would double-count — the vma transpose
    already psums cotangents of unvarying inputs.)  The optimizer update runs
    replicated outside.
    """
    rep = P()
    dev = P(axis)

    def local_loss(params, batch, rng):
        # one device's shard: strip the leading singleton device axis
        local = jax.tree.map(lambda x: x[0], {k: v for k, v in batch.items()
                                              if k != 'vocab_mask'})
        local['vocab_mask'] = batch['vocab_mask']
        idx = jax.lax.axis_index(axis)
        rng = jax.random.fold_in(rng, idx)
        loss, metrics, aux = model.apply(
            params, local, beta, rng, perturb_z, False,
            rngs={'dropout': jax.random.fold_in(rng, 1)})
        loss = jax.lax.pmean(loss, axis)
        metrics = jax.tree.map(lambda x: jax.lax.pmean(x, axis), metrics)
        clipped = jax.lax.pmax(aux['clipped'].astype(jnp.int32), axis)
        return loss, (metrics, {'clipped': clipped})

    def batch_spec(batch):
        return {k: (rep if k == 'vocab_mask' else jax.tree.map(lambda _: dev, v))
                for k, v in batch.items()}

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng):
        sharded = shard_map(
            local_loss, mesh=mesh,
            in_specs=(rep, batch_spec(batch), rep),
            out_specs=(rep, (rep, rep)))
        (loss, (metrics, aux)), grads = jax.value_and_grad(
            sharded, has_aux=True)(params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, metrics, aux

    return step


def shard_model_batches(batches: Sequence[Dict], mesh: Mesh,
                        axis: str = 'data') -> Dict:
    """Stack per-device batches and lay them out over the mesh."""
    stacked = stack_batches(batches)
    dev_spec = NamedSharding(mesh, P(axis))
    rep_spec = NamedSharding(mesh, P())

    def put(k, v):
        if k == 'vocab_mask':
            return jax.device_put(v, rep_spec)
        return jax.tree.map(lambda x: jax.device_put(x, dev_spec), v)

    return {k: put(k, v) for k, v in stacked.items()}
