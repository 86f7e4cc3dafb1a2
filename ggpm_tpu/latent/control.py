"""Inference-time latent-space property optimization.

Reference: /root/reference/ggpm/property_control.py:13-216 — gradient search
on the latent code against HOMO/LUMO targets with three stopping policies
(soft / patience / hard) and a sign-flipped learning rate (ascend when the
prediction is below target, descend when above).

TPU-first redesign: the reference loops per *sample* in Python with
``backward(retain_graph)``; here each policy is a single batched
``jax.lax.while_loop`` under jit — per-sample stopping is a boolean `live`
mask, so the whole batch optimizes in lockstep on device.  ``jax.grad``
differentiates through the property heads w.r.t. the latent halves.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np


def _per_sample_losses(model, params, h_vecs, l_vecs, h_tar, l_tar):
    """Per-sample squared errors from the property heads (the reference uses
    mean-reduced MSE per sample pair, property_control.py:85)."""
    def head(hv, lv):
        return model.apply(params, hv[None], lv[None],
                           method=lambda m, a, b:
                           m.property_optim.predict(a, b))
    h_out, l_out = jax.vmap(head)(h_vecs, l_vecs)
    h_out, l_out = h_out[:, 0], l_out[:, 0]
    h_loss = jnp.where(jnp.isfinite(h_tar), (h_out - h_tar) ** 2, 0.0)
    l_loss = jnp.where(jnp.isfinite(l_tar), (l_out - l_tar) ** 2, 0.0)
    return h_loss, l_loss, h_out, l_out


class LatentOptimizer:
    """soft/patience/hard latent search (reference PropertyVAEOptimizer)."""

    def __init__(self, model, params, optimize_type: str = 'soft',
                 latent_lr: float = 1.0, property_optim_step: int = 50,
                 property_delta: float = 0.1, patience: int = 5,
                 patience_threshold: float = 0.1):
        self.model = model
        self.params = params
        self.optimize_type = optimize_type
        self.lr = latent_lr
        self.steps = property_optim_step
        self.delta = property_delta
        self.patience = patience
        self.threshold = patience_threshold
        if optimize_type not in ('soft', 'patience', 'fixed', 'hard'):
            raise ValueError(
                f'Error: property-optimizing choice "{optimize_type}" is not valid')

    # ------------------------------------------------------------------
    def _grad_step(self, h_vecs, l_vecs, h_tar, l_tar,
                   reduction: str = 'sum'):
        """One gradient update with the reference's sign rule
        (update_params, property_control.py:65-69): z ← z − sign·lr·∇z where
        sign = +1 if pred < target else −1 ... note the reference computes
        ``gradient_sign = (preds < targets)·(−2) + 1`` then SUBTRACTS
        sign·lr·grad.

        ``reduction``: the reference's soft/patience policies backprop each
        sample's own loss in a per-sample Python loop
        (property_control.py:100-105) — per-row gradient d(loss_i)/d(vec_i),
        which sum's VJP delivers — while hard_optimize backprops a BATCHED
        ``MSELoss(reduction='mean')`` (property_optimizer.py:20,
        property_control.py:159-180), scaling each row's gradient by 1/b."""
        def total(hv, lv):
            h_loss, l_loss, h_out, l_out = _per_sample_losses(
                self.model, self.params, hv, lv, h_tar, l_tar)
            if reduction == 'mean':
                return h_loss.mean() + l_loss.mean(), (h_out, l_out)
            return h_loss.sum() + l_loss.sum(), (h_out, l_out)

        (loss, (h_out, l_out)), grads = jax.value_and_grad(
            total, argnums=(0, 1), has_aux=True)(h_vecs, l_vecs)
        gh, gl = grads
        h_sign = jnp.where(h_out < h_tar, -1.0, 1.0)[:, None]
        l_sign = jnp.where(l_out < l_tar, -1.0, 1.0)[:, None]
        new_h = h_vecs - h_sign * self.lr * gh
        new_l = l_vecs - l_sign * self.lr * gl
        return new_h, new_l, loss

    def _batched_losses(self, h_vecs, l_vecs, h_tar, l_tar):
        h_loss, l_loss, _, _ = _per_sample_losses(
            self.model, self.params, h_vecs, l_vecs, h_tar, l_tar)
        return h_loss + l_loss

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def hard_optimize(self, h_vecs, l_vecs, h_tar, l_tar):
        """Fixed number of batched steps (reference property_control.py:159-180)."""
        def body(_, carry):
            h, l = carry
            h, l, _ = self._grad_step(h, l, h_tar, l_tar, reduction='mean')
            return (h, l)
        h, l = jax.lax.fori_loop(0, self.steps, body, (h_vecs, l_vecs))
        return jnp.concatenate([h, l], axis=-1)

    @partial(jax.jit, static_argnums=0)
    def soft_optimize(self, h_vecs, l_vecs, h_tar, l_tar):
        """Optimize until per-sample loss ≤ delta or patience runs out
        (reference property_control.py:71-114), batched with a live mask."""
        return self._masked_optimize(h_vecs, l_vecs, h_tar, l_tar, use_delta=True)

    @partial(jax.jit, static_argnums=0)
    def patience_optimize(self, h_vecs, l_vecs, h_tar, l_tar):
        """Optimize until patience runs out (reference
        property_control.py:116-157)."""
        return self._masked_optimize(h_vecs, l_vecs, h_tar, l_tar, use_delta=False)

    def _masked_optimize(self, h_vecs, l_vecs, h_tar, l_tar, use_delta: bool):
        b = h_vecs.shape[0]
        init = (h_vecs, l_vecs,
                jnp.zeros(b),                       # prev_loss
                jnp.full(b, self.patience, dtype=jnp.int32),
                jnp.zeros(b, dtype=bool),           # done
                jnp.int32(0))                       # iteration counter

        max_iters = max(self.steps * 20, 1000)      # hard safety bound

        def cond(carry):
            _, _, _, _, done, it = carry
            return jnp.logical_and(~jnp.all(done), it < max_iters)

        def body(carry):
            h, l, prev, patience, done, it = carry
            losses = self._batched_losses(h, l, h_tar, l_tar)
            hit_delta = jnp.logical_and(use_delta, losses <= self.delta)
            # patience rule (reference property_control.py:93-97): decrement
            # when loss grew or relative improvement below threshold
            rel = jnp.abs(losses - prev) / jnp.maximum(jnp.abs(prev), 1e-12)
            worse = jnp.logical_or(losses > prev, rel <= self.threshold)
            patience_new = jnp.where(worse, patience - 1, self.patience)

            # reference order of operations (property_control.py:88-105):
            # the delta break happens BEFORE the gradient step, but the
            # patience-exhausting iteration still TAKES its step (backward +
            # update run before the `while patience > 0` re-check) — so the
            # step is gated only on delta/done, while done absorbs both
            nh, nl, _ = self._grad_step(h, l, h_tar, l_tar)
            stepping = ~jnp.logical_or(done, hit_delta)
            h = jnp.where(stepping[:, None], nh, h)
            l = jnp.where(stepping[:, None], nl, l)
            prev = jnp.where(stepping, losses, prev)
            patience = jnp.where(stepping, patience_new, patience)
            done = done | hit_delta | (stepping & (patience_new <= 0))
            return (h, l, prev, patience, done, it + 1)

        h, l, _, _, _, _ = jax.lax.while_loop(cond, body, init)
        return jnp.concatenate([h, l], axis=-1)

    # ------------------------------------------------------------------
    def optimize(self, root_vecs: jnp.ndarray, homos, lumos) -> jnp.ndarray:
        half = root_vecs.shape[-1] // 2
        h_vecs, l_vecs = root_vecs[:, :half], root_vecs[:, half:]
        h_tar = jnp.asarray(homos, dtype=jnp.float32)
        l_tar = jnp.asarray(lumos, dtype=jnp.float32)
        fn = {'soft': self.soft_optimize, 'patience': self.patience_optimize,
              'fixed': self.hard_optimize, 'hard': self.hard_optimize}[self.optimize_type]
        return fn(h_vecs, l_vecs, h_tar, l_tar)


def control_decode(model, params, vocab, avocab, batch, homos, lumos,
                   optimizer: LatentOptimizer, max_decode_step: int = 150):
    """encode → latent search → property prediction → decode
    (reference PropertyVAEOptimizer.forward, property_control.py:33-63)."""
    import jax.numpy as jnp
    from ..models.decode import decode_motif

    z, _ = model.apply(params, batch['tree'],
                       method=lambda m, tree: m.encode_latent(tree, perturb=False))
    z_opt = optimizer.optimize(z, homos, lumos)
    props = model.apply(params, z_opt,
                        method=lambda m, zz: m.predict_properties(zz))
    results, smiles = decode_motif(model, params, vocab, avocab,
                                   np.asarray(z_opt), greedy=True,
                                   max_decode_step=max_decode_step)
    return (np.asarray(props[0]), np.asarray(props[1])), results, smiles
