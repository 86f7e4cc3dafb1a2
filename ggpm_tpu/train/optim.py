"""Optimizers: Adam + exponential LR decay + gradient clipping, and the
per-subnetwork optimizer used by individual fine-tuning.

Reference: Adam/ExponentialLR/clip_grad_norm wiring in
/root/reference/vae_train.py:60-83 and ``MultipleOptimizer``
(/root/reference/ggpm/optim.py:4-26) — realised here as a single optax
``multi_transform`` over parameter groups, which is the idiomatic (and
jit-compatible) form of N independent Adam+decay optimizers.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import optax


def make_lr_schedule(lr: float, anneal_rate: float, steps_per_epoch: int):
    """Stepwise exponential decay: lr × anneal_rate^epoch (reference decays
    once per epoch / save_iter, vae_train.py:104,110)."""
    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return lr * (anneal_rate ** epoch)
    return schedule


def make_optimizer(lr: float = 1e-3, clip_norm: float = 20.0,
                   anneal_rate: float = 0.9, steps_per_epoch: int = 1000,
                   flatten: bool = False):
    """Adam + exponential decay + global-norm clip.

    ``flatten=True`` wraps the chain in ``optax.flatten`` so clip/adam run
    on ONE ravelled vector instead of per-leaf (~60 leaves × ~10 HLOs →
    ~10 HLOs + a concat): the training step is op-count-bound on TPU
    (runs/TRACE_step.json), so the per-leaf optimizer costs real wall time.
    Numerically identical up to float reduction order (the global norm sums
    in a different association)."""
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(
            make_lr_schedule(lr, anneal_rate, steps_per_epoch)),
    )
    return optax.flatten(tx) if flatten else tx


def make_multi_optimizer(group_fn: Callable[[str], str],
                         lrs: Dict[str, float], clip_norm: float = 20.0,
                         anneal_rate: float = 0.9, steps_per_epoch: int = 1000):
    """Per-subnetwork optimizers (encoder/decoder/property heads with their
    own LRs — reference vae_fine_tune_indv_opt.py:61-70).

    ``group_fn`` maps a flattened parameter path string to a group name in
    ``lrs``.
    """
    transforms = {
        name: make_optimizer(lr, clip_norm, anneal_rate, steps_per_epoch)
        for name, lr in lrs.items()
    }

    def label_tree(params):
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        labels = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(params),
            [group_fn(jax.tree_util.keystr(path)) for path, _ in flat])
        return labels

    return optax.multi_transform(transforms, label_tree)


def default_group_fn(path: str) -> str:
    """Route params to encoder/decoder/homo/lumo groups by pytree path."""
    if 'homo_linear' in path:
        return 'homo'
    if 'lumo_linear' in path:
        return 'lumo'
    if 'encoder' in path:
        return 'encoder'
    return 'decoder'
