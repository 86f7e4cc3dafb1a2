"""Message-passing RNN cells (GRU / LSTM) as flax modules.

Re-designs the reference's edge-message recurrences
(/root/reference/ggpm/rnn.py:5-121) for XLA: the depth loop is a
``lax.fori_loop`` over dense state buffers; the "sparse" incremental update
used by the autoregressive decoder becomes a batched cell application on a
row subset (``step_rows``) suitable for use inside ``lax.scan``.

State layout: ``h`` (and ``c`` for LSTM) are ``[num_messages, hidden]``
buffers whose row 0 is the all-zero padding message.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import gather_nd, zero_row0


class MPNGRUCell(nn.Module):
    """Edge-message GRU (reference rnn.py:5-59)."""
    hidden_size: int
    depth: int

    def setup(self):
        h = self.hidden_size
        self.W_z = nn.Dense(h)
        self.W_r = nn.Dense(h, use_bias=False)
        self.U_r = nn.Dense(h)
        self.W_h = nn.Dense(h)

    def init_state(self, num_mess: int, init_rows: jnp.ndarray = None):
        h = jnp.zeros((num_mess, self.hidden_size))
        if init_rows is not None:
            h = jnp.concatenate([h, init_rows], axis=0)
        return (h,)

    @staticmethod
    def hidden(state) -> jnp.ndarray:
        return state[0]

    def cell(self, x: jnp.ndarray, state_nei) -> Tuple[jnp.ndarray, ...]:
        """x: [R, in]; state_nei: ([R, A, H],)."""
        h_nei, = state_nei
        sum_h = h_nei.sum(axis=-2)
        z = jax.nn.sigmoid(self.W_z(jnp.concatenate([x, sum_h], axis=-1)))
        r1 = self.W_r(x)[..., None, :]
        r2 = self.U_r(h_nei)
        r = jax.nn.sigmoid(r1 + r2)
        sum_gated_h = (r * h_nei).sum(axis=-2)
        pre_h = jnp.tanh(self.W_h(jnp.concatenate([x, sum_gated_h], axis=-1)))
        return ((1.0 - z) * sum_h + z * pre_h,)

    def __call__(self, fmess: jnp.ndarray, bgraph: jnp.ndarray):
        """Full dense forward: ``depth`` rounds over every message."""
        num_mess = fmess.shape[0]
        state = (jnp.zeros((num_mess, self.hidden_size)),)

        def body(_, state):
            nei = tuple(gather_nd(s, bgraph) for s in state)
            new = self.cell(fmess, nei)
            return tuple(zero_row0(s) for s in new)

        return _unrolled(body, self.depth, state)


class MPNLSTMCell(nn.Module):
    """Edge-message LSTM with per-neighbour forget gates (reference
    rnn.py:61-121)."""
    hidden_size: int
    depth: int

    def setup(self):
        h = self.hidden_size
        self.W_i = nn.Dense(h)
        self.W_o = nn.Dense(h)
        self.W_f = nn.Dense(h)
        self.W = nn.Dense(h)

    def init_state(self, num_mess: int, init_rows: jnp.ndarray = None):
        h = jnp.zeros((num_mess, self.hidden_size))
        c = jnp.zeros((num_mess, self.hidden_size))
        if init_rows is not None:
            h = jnp.concatenate([h, init_rows], axis=0)
            c = jnp.concatenate([c, jnp.zeros_like(init_rows)], axis=0)
        return (h, c)

    @staticmethod
    def hidden(state) -> jnp.ndarray:
        return state[0]

    def cell(self, x: jnp.ndarray, state_nei):
        h_nei, c_nei = state_nei
        h_sum = h_nei.sum(axis=-2)
        xh = jnp.concatenate([x, h_sum], axis=-1)
        i = jax.nn.sigmoid(self.W_i(xh))
        o = jax.nn.sigmoid(self.W_o(xh))
        u = jnp.tanh(self.W(xh))
        x_expand = jnp.broadcast_to(x[..., None, :], h_nei.shape[:-1] + (x.shape[-1],))
        f = jax.nn.sigmoid(self.W_f(jnp.concatenate([x_expand, h_nei], axis=-1)))
        c = i * u + (f * c_nei).sum(axis=-2)
        h = o * jnp.tanh(c)
        return (h, c)

    def __call__(self, fmess: jnp.ndarray, bgraph: jnp.ndarray):
        num_mess = fmess.shape[0]
        state = (jnp.zeros((num_mess, self.hidden_size)),
                 jnp.zeros((num_mess, self.hidden_size)))

        def body(_, state):
            nei = tuple(gather_nd(s, bgraph) for s in state)
            new = self.cell(fmess, nei)
            return tuple(zero_row0(s) for s in new)

        return _unrolled(body, self.depth, state)


def _unrolled(body, depth: int, state):
    """Static unroll of the depth loop.

    ``depth`` is a hyperparameter (20 in the canonical config); unrolling lets
    XLA pipeline the gather → matmul chain across iterations instead of
    carrying a loop barrier.  For very deep configs fall back to fori_loop.
    """
    if depth <= 24:
        for i in range(depth):
            state = body(i, state)
        return state
    return jax.lax.fori_loop(0, depth, body, state)


def make_cell(rnn_type: str, hidden_size: int, depth: int, name=None):
    if rnn_type == 'GRU':
        return MPNGRUCell(hidden_size=hidden_size, depth=depth, name=name)
    if rnn_type == 'LSTM':
        return MPNLSTMCell(hidden_size=hidden_size, depth=depth, name=name)
    raise ValueError(f'unsupported rnn cell type {rnn_type}')
