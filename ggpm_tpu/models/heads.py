"""Property-regression heads and homoscedastic loss weighing.

Reference: /root/reference/ggpm/property_optimizer.py:5-67 and
/root/reference/ggpm/loss_weigh.py:5-23.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp


class PropertyRegressor(nn.Module):
    """MLP stack ending in a scalar output."""
    hidden_sizes: Tuple[int, ...]
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        for h in self.hidden_sizes:
            x = nn.relu(nn.Dense(h)(x))
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(1)(x)[..., 0]


class PropertyOptimizer(nn.Module):
    """HOMO and LUMO heads over the two halves of the latent code
    (reference property_optimizer.py:5-52)."""
    hidden_size: Union[int, Sequence[int]] = 128
    dropout: float = 0.0

    def setup(self):
        hs = (self.hidden_size,) if isinstance(self.hidden_size, int) \
            else tuple(self.hidden_size)
        self.homo_linear = PropertyRegressor(hidden_sizes=hs, dropout=self.dropout)
        self.lumo_linear = PropertyRegressor(hidden_sizes=hs, dropout=self.dropout)

    def predict(self, homo_vecs, lumo_vecs, deterministic=True):
        return (self.homo_linear(homo_vecs, deterministic),
                self.lumo_linear(lumo_vecs, deterministic))

    def __call__(self, homo_vecs, lumo_vecs, targets, deterministic=True):
        homo_out, lumo_out = self.predict(homo_vecs, lumo_vecs, deterministic)
        homo_t, lumo_t = targets
        # mean-squared error, NaN targets masked out (rows without labels)
        homo_loss = _masked_mse(homo_out, homo_t)
        lumo_loss = _masked_mse(lumo_out, lumo_t)
        return homo_loss, lumo_loss, homo_out, lumo_out


def _masked_mse(pred, target):
    ok = jnp.isfinite(target)
    err = jnp.where(ok, pred - jnp.where(ok, target, 0.0), 0.0)
    return (err * err).sum() / jnp.maximum(ok.sum(), 1)


class LossWeigh(nn.Module):
    """Learned homoscedastic-uncertainty loss scaling
    (reference loss_weigh.py:5-23): ``loss·exp(−s) + s`` per task."""

    def setup(self):
        zeros = nn.initializers.zeros
        self.homo_log_var = self.param('homo_log_var', zeros, (1,))
        self.lumo_log_var = self.param('lumo_log_var', zeros, (1,))
        self.recon_log_var = self.param('recon_log_var', zeros, (1,))

    def compute_recon_loss(self, loss):
        return loss * jnp.exp(-self.recon_log_var)[0] + self.recon_log_var[0]

    def compute_prop_loss(self, homo_loss, lumo_loss):
        h = homo_loss * jnp.exp(-self.homo_log_var)[0] + self.homo_log_var[0]
        l = lumo_loss * jnp.exp(-self.lumo_log_var)[0] + self.lumo_log_var[0]
        return h, l

    def __call__(self, loss, homo_loss, lumo_loss):
        return (self.compute_recon_loss(loss),) + \
            self.compute_prop_loss(homo_loss, lumo_loss)
