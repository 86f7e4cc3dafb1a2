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
        # check_vma=False: the transpose-table gather ops (ops.graph_ops)
        # are custom_vjp, whose bwd rules defeat shard_map's static
        # varying-mesh-axes inference for the replicated params cotangent.
        # The psum the transpose inserts is unaffected — numerics are
        # pinned by the DP-vs-single-device grad-agreement test.
        sharded = shard_map(
            local_loss, mesh=mesh,
            in_specs=(rep, batch_spec(batch), rep),
            out_specs=(rep, (rep, rep)), check_vma=False)
        (loss, (metrics, aux)), grads = jax.value_and_grad(
            sharded, has_aux=True)(params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, metrics, aux

    return step


def make_mesh_2d(dp: int, tp: int, devices=None) -> Mesh:
    """A (data × model) 2-D mesh for combined DP + vocab-dim TP."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= dp * tp, (len(devices), dp, tp)
    return Mesh(np.asarray(devices[:dp * tp]).reshape(dp, tp),
                ('data', 'model'))


def param_partition_spec(params, tp_axis: str = 'model',
                         min_dim: int = 256):
    """Partition specs for DP+TP: vocab-dimension parameter matrices are
    sharded over ``tp_axis``, everything else replicated.

    The only tensors worth model-sharding in this family are the ones with
    a vocabulary-sized dimension — motif/attachment embeddings
    (|vocab| × embed) and the cls/icls output heads (hidden × |vocab|);
    at the reference's full scale (6.2k attachments × hidden 700) they
    dominate parameter memory.  Hidden-sized matrices stay replicated
    (SURVEY §2.6: TP of a 250-700 hidden dim is counterproductive)."""

    def spec_for(path, x):
        name = '/'.join(getattr(p, 'key', str(p)) for p in path)
        if getattr(x, 'ndim', 0) != 2:
            return P()
        is_vocab_embed = ('E_c' in name or 'E_i' in name) and \
            'embedding' in name and x.shape[0] >= min_dim
        is_vocab_head = ('cls' in name.lower() and 'kernel' in name
                         and x.shape[-1] >= min_dim)
        if is_vocab_embed:
            return P(tp_axis, None)
        if is_vocab_head:
            return P(None, tp_axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def make_gspmd_train_step(model, optimizer, mesh: Mesh, beta: float = 0.1,
                          perturb_z: bool = True,
                          tp_min_dim: int = 256) -> Callable:
    """Combined DP + TP step via GSPMD sharding propagation.

    DP: the loss is ``vmap``-ed over the stacked [D, ...] device axis of
    the batch, which is sharded over the mesh's ``data`` axis — XLA
    partitions the vmapped computation across data rows exactly like the
    shard_map formulation, inserting the gradient ``psum`` automatically.
    TP: vocab-dimension parameters carry ``model``-axis shardings
    (param_partition_spec); GSPMD propagates them through the embedding
    gathers and cls-head matmuls and inserts the collectives (all-gather
    of logits rows / reduce-scatter of their grads) without any change to
    the model code.  Optimizer state inherits the param shardings.

    Returns (step, place) where ``place(params, opt_state, stacked)``
    lays the trees out over the mesh.
    """
    rep = NamedSharding(mesh, P())

    def loss_fn(params, stacked, rng):
        d = jax.tree.leaves({k: v for k, v in stacked.items()
                             if k != 'vocab_mask'})[0].shape[0]
        rngs = jax.random.split(rng, d)

        def per_dev(batch, r):
            batch = dict(batch, vocab_mask=stacked['vocab_mask'])
            loss, metrics, aux = model.apply(
                params, batch, beta, r, perturb_z, False,
                rngs={'dropout': jax.random.fold_in(r, 1)})
            return loss, metrics, aux['clipped'].astype(jnp.int32)

        losses, metrics, clipped = jax.vmap(per_dev)(
            {k: v for k, v in stacked.items() if k != 'vocab_mask'}, rngs)
        metrics = jax.tree.map(lambda x: x.mean(), metrics)
        return losses.mean(), (metrics, {'clipped': clipped.max()})

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, stacked, rng):
        (loss, (metrics, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, stacked, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, metrics, aux

    def place(params, opt_state, stacked):
        pspec = param_partition_spec(params, min_dim=tp_min_dim)
        params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params, pspec)
        # optimizer-state subtrees that mirror the param tree (Adam mu/nu)
        # take the SAME shardings — otherwise TP-sharded params keep
        # replicated moments (losing the TP memory win) and the first
        # donated step reshards its outputs
        ptree = jax.tree.structure(params)

        def place_opt(tree):
            if jax.tree.structure(tree) == ptree:
                return jax.tree.map(
                    lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                    tree, pspec)
            if isinstance(tree, tuple) and hasattr(tree, '_fields'):
                return type(tree)(*[place_opt(t) for t in tree])
            if isinstance(tree, (list, tuple)):
                return type(tree)(place_opt(t) for t in tree)
            if isinstance(tree, dict):
                return {k: place_opt(v) for k, v in tree.items()}
            return jax.device_put(tree, rep)

        opt_state = place_opt(opt_state)
        stacked = {
            k: (jax.device_put(v, rep) if k == 'vocab_mask'
                else jax.tree.map(
                    lambda x: jax.device_put(
                        x, NamedSharding(mesh, P('data'))), v))
            for k, v in stacked.items()}
        return params, opt_state, stacked

    return step, place


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
