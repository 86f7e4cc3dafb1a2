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

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import gather_nd, gather_nd_t, zero_row0


def _fused_gather(bgraph, bt):
    """Single row-gather closure for the depth loop.

    The loop body gathers several per-message tables (state, projected
    gates, cell memory) by the SAME ``bgraph`` index every iteration; the
    caller concatenates them into one wide table and gathers ONCE — the
    b240 device trace (runs/TRACE_step.json) shows the step is bound by
    async copy/DMA descriptor count (~1.9k/step at mbu_gather ≈ 0.1), not
    by gather bytes, so one [E, A, kH] gather beats k [E, A, H] gathers.

    With ``bt`` — a host-precomputed ``(t_idx, t_mask)`` transpose of
    ``bgraph`` (ops.build_transpose) — the gather uses the transpose-table
    backward, replacing XLA's scatter-add VJP with a dense gather
    (runs/PROFILE_bwd.json: the scatter-adds were ~52 of the 89 ms
    canonical-b240 step).  Gradient-exact at these call sites: see the
    note in ops/graph_ops.py and the grad-equivalence test
    (tests/test_models.py::test_transpose_table_grads_exact)."""
    if bt is None:
        return lambda v: gather_nd(v, bgraph)
    t_idx, t_mask = bt
    return lambda v: gather_nd_t(v, bgraph, t_idx, t_mask)


class MPNGRUCell(nn.Module):
    """Edge-message GRU (reference rnn.py:5-59).  ``dtype`` selects the
    computation precision (bf16 halves the HBM traffic of the depth loop's
    state round-trips; params stay f32)."""
    hidden_size: int
    depth: int
    dtype: Optional[Any] = None
    remat: bool = False   # checkpoint each depth iteration (see _unrolled)

    def setup(self):
        h = self.hidden_size
        self.W_z = nn.Dense(h, dtype=self.dtype)
        self.W_r = nn.Dense(h, use_bias=False, dtype=self.dtype)
        self.U_r = nn.Dense(h, dtype=self.dtype)
        self.W_h = nn.Dense(h, dtype=self.dtype)

    def init_state(self, num_mess: int, init_rows: jnp.ndarray = None):
        h = jnp.zeros((num_mess, self.hidden_size), dtype=self.dtype)
        if init_rows is not None:
            h = jnp.concatenate([h, init_rows.astype(h.dtype)], axis=0)
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
        r2 = self.U_r(h_nei)   # per-neighbour H→H projection (already slim)
        r = jax.nn.sigmoid(r1 + r2)
        sum_gated_h = (r * h_nei).sum(axis=-2)
        pre_h = jnp.tanh(self.W_h(jnp.concatenate([x, sum_gated_h], axis=-1)))
        return ((1.0 - z) * sum_h + z * pre_h,)

    # -- split-step API for the teacher-forced decoder scan -----------------
    # Same math as ``cell`` by linearity of the Dense layers; the x-side
    # projections are loop-invariant per message, so the decoder hoists them
    # out of its scan (see MotifDecoder._run_scan).
    def x_proj(self, x: jnp.ndarray) -> jnp.ndarray:
        """Per-message loop-invariant gate terms: xz | xr' | xh_pre
        ([..., 3H]).  Biases live here (U_r's bias is folded into xr')."""
        h0 = jnp.zeros(x.shape[:-1] + (self.hidden_size,), dtype=x.dtype)
        xh0 = jnp.concatenate([x, h0], axis=-1)
        xr = self.W_r(x) + self.U_r.variables['params']['bias']
        return jnp.concatenate([self.W_z(xh0), xr, self.W_h(xh0)], axis=-1)

    def k_h(self):
        """h-side kernels (kz [H,H], kh [H,H], U_r kernel [H,H])."""
        kz = self.W_z.variables['params']['kernel']
        kh = self.W_h.variables['params']['kernel']
        ku = self.U_r.variables['params']['kernel']
        h = self.hidden_size
        kz, kh = kz[-h:], kh[-h:]
        if self.dtype is not None:
            kz, kh, ku = (k.astype(self.dtype) for k in (kz, kh, ku))
        return kz, kh, ku

    @staticmethod
    def step(xp: jnp.ndarray, state_nei, ks):
        """One cell application from hoisted x terms: xp [R, 3H] from
        ``x_proj``, state_nei = (h_nei [R, A, H],), ks from ``k_h``."""
        kz, kh, ku = ks
        h_nei, = state_nei
        H = h_nei.shape[-1]
        xz, xr, xh_pre = xp[..., :H], xp[..., H:2 * H], xp[..., 2 * H:]
        sum_h = h_nei.sum(axis=-2)
        z = jax.nn.sigmoid(xz + sum_h @ kz)
        r = jax.nn.sigmoid(xr[..., None, :] + h_nei @ ku)
        sum_gated_h = (r * h_nei).sum(axis=-2)
        pre_h = jnp.tanh(xh_pre + sum_gated_h @ kh)
        return ((1.0 - z) * sum_h + z * pre_h,)

    def __call__(self, fmess: jnp.ndarray, bgraph: jnp.ndarray, bt=None):
        """Full dense forward: ``depth`` rounds over every message.

        Hot-loop restructure (same math as ``cell``, by linearity of the
        dense layers): the x-side projections of every gate are
        loop-invariant and are hoisted out of the depth loop, and the
        per-neighbour reset-gate projection ``U_r(h_nei)`` becomes
        project-once-then-gather — an [E, H]×[H, H] matmul instead of an
        [E, A, H]×[H, H] one (A× fewer FLOPs).  In-loop matmul cost drops
        from 2·(in+H)·H + A·H·H to 3·H·H per message per iteration."""
        num_mess = fmess.shape[0]
        in_dim = fmess.shape[-1]
        h0 = jnp.zeros((num_mess, self.hidden_size), dtype=self.dtype)

        # loop-invariant x projections (bias lives here)
        xh0 = jnp.concatenate([fmess, h0], axis=-1)
        xz = self.W_z(xh0)
        xr = self.W_r(fmess)[..., None, :]
        xh_pre = self.W_h(xh0)
        # h-side kernel slices of the concat layers (params stay f32;
        # cast to the compute dtype like nn.Dense(dtype=...) does)
        kz = self.W_z.variables['params']['kernel'][in_dim:]
        kh = self.W_h.variables['params']['kernel'][in_dim:]
        if self.dtype is not None:
            kz = kz.astype(self.dtype)
            kh = kh.astype(self.dtype)

        # materialize U_r's params once so the loop body is a pure array
        # closure (jax.checkpoint-able in _unrolled); h0 is zeros so the
        # call itself is just the bias broadcast
        self.U_r(h0)
        ur_k = self.U_r.variables['params']['kernel']
        ur_b = self.U_r.variables['params']['bias']
        if self.dtype is not None:
            ur_k, ur_b = ur_k.astype(self.dtype), ur_b.astype(self.dtype)

        gth = _fused_gather(bgraph, bt)
        H = self.hidden_size

        def body(_, state):
            h, = state
            # one fused gather of [h | U_r h + b]: h_nei feeds both the
            # neighbour sum and the reset-gated sum (see _fused_gather)
            g = gth(jnp.concatenate([h, h @ ur_k + ur_b], axis=-1))
            h_nei, r_pre = g[..., :H], g[..., H:]
            sum_h = h_nei.sum(axis=-2)
            z = jax.nn.sigmoid(xz + sum_h @ kz)
            r = jax.nn.sigmoid(xr + r_pre)
            sum_gated_h = (r * h_nei).sum(axis=-2)
            pre_h = jnp.tanh(xh_pre + sum_gated_h @ kh)
            return (zero_row0((1.0 - z) * sum_h + z * pre_h),)

        return _unrolled(body, self.depth, (h0,), self.remat)


class MPNLSTMCell(nn.Module):
    """Edge-message LSTM with per-neighbour forget gates (reference
    rnn.py:61-121).  ``dtype``: see MPNGRUCell."""
    hidden_size: int
    depth: int
    dtype: Optional[Any] = None
    remat: bool = False   # checkpoint each depth iteration (see _unrolled)

    def setup(self):
        h = self.hidden_size
        self.W_i = nn.Dense(h, dtype=self.dtype)
        self.W_o = nn.Dense(h, dtype=self.dtype)
        self.W_f = nn.Dense(h, dtype=self.dtype)
        self.W = nn.Dense(h, dtype=self.dtype)

    def init_state(self, num_mess: int, init_rows: jnp.ndarray = None):
        h = jnp.zeros((num_mess, self.hidden_size), dtype=self.dtype)
        c = jnp.zeros((num_mess, self.hidden_size), dtype=self.dtype)
        if init_rows is not None:
            h = jnp.concatenate([h, init_rows.astype(h.dtype)], axis=0)
            c = jnp.concatenate([c, jnp.zeros_like(h[:init_rows.shape[0]])],
                                axis=0)
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
        # per-neighbour forget gate by linearity: W_f([x, h_k]) =
        # W_f([x, 0]) + h_k @ Kf — an [R, in+H] + [R, A, H]×[H, H] pair
        # instead of the reference's [R·A, in+H]×[in+H, H] (rnn.py:100-103);
        # the teacher-forced decoder scan applies this cell every step
        xf = self.W_f(jnp.concatenate([x, jnp.zeros_like(h_sum)], axis=-1))
        kf = self.W_f.variables['params']['kernel'][x.shape[-1]:]
        if self.dtype is not None:
            kf = kf.astype(self.dtype)
        f = jax.nn.sigmoid(xf[..., None, :] + h_nei @ kf)
        c = i * u + (f * c_nei).sum(axis=-2)
        h = o * jnp.tanh(c)
        return (h, c)

    # -- split-step API for the teacher-forced decoder scan -----------------
    # (same math as ``cell``; see MPNGRUCell for the rationale)
    def x_proj(self, x: jnp.ndarray) -> jnp.ndarray:
        """Loop-invariant gate terms xi | xo | xu | xf ([..., 4H]),
        biases included."""
        h0 = jnp.zeros(x.shape[:-1] + (self.hidden_size,), dtype=x.dtype)
        xh0 = jnp.concatenate([x, h0], axis=-1)
        return jnp.concatenate(
            [self.W_i(xh0), self.W_o(xh0), self.W(xh0), self.W_f(xh0)],
            axis=-1)

    def k_h(self):
        """h-side kernels: (K_iou stacked [H, 3H], kf [H, H])."""
        h = self.hidden_size
        ki = self.W_i.variables['params']['kernel'][-h:]
        ko = self.W_o.variables['params']['kernel'][-h:]
        ku = self.W.variables['params']['kernel'][-h:]
        kf = self.W_f.variables['params']['kernel'][-h:]
        if self.dtype is not None:
            ki, ko, ku, kf = (k.astype(self.dtype)
                              for k in (ki, ko, ku, kf))
        return jnp.concatenate([ki, ko, ku], axis=-1), kf

    @staticmethod
    def step(xp: jnp.ndarray, state_nei, ks):
        """One cell application from hoisted x terms: xp [R, 4H] from
        ``x_proj``, state_nei = (h_nei, c_nei) each [R, A, H]."""
        kiou, kf = ks
        h_nei, c_nei = state_nei
        H = h_nei.shape[-1]
        xi, xo, xu, xf = (xp[..., :H], xp[..., H:2 * H],
                          xp[..., 2 * H:3 * H], xp[..., 3 * H:])
        h_sum = h_nei.sum(axis=-2)
        g = h_sum @ kiou                                    # [R, 3H]
        i = jax.nn.sigmoid(xi + g[..., :H])
        o = jax.nn.sigmoid(xo + g[..., H:2 * H])
        u = jnp.tanh(xu + g[..., 2 * H:])
        f = jax.nn.sigmoid(xf[..., None, :] + h_nei @ kf)
        c = i * u + (f * c_nei).sum(axis=-2)
        h = o * jnp.tanh(c)
        return (h, c)

    def __call__(self, fmess: jnp.ndarray, bgraph: jnp.ndarray, bt=None):
        """Full dense forward with the hoisted/projected restructure (same
        math as ``cell`` by linearity — see MPNGRUCell.__call__).  The big
        win is the per-neighbour forget gate: the reference computes
        ``W_f([x, h_k])`` as an [E, A, in+H]×[in+H, H] matmul every
        iteration (reference rnn.py:100-103); here the h-side is projected
        once per iteration ([E, H]×[H, H]) and gathered, cutting the
        dominant matmul cost ≈ A·(in+H)/H ≈ 36× at canonical shapes."""
        num_mess = fmess.shape[0]
        in_dim = fmess.shape[-1]
        h0 = jnp.zeros((num_mess, self.hidden_size), dtype=self.dtype)

        # loop-invariant x projections (biases live here)
        xh0 = jnp.concatenate([fmess, h0], axis=-1)
        xi = self.W_i(xh0)
        xo = self.W_o(xh0)
        xu = self.W(xh0)
        xf = self.W_f(xh0)[..., None, :]
        # h-side kernel slices (cast like nn.Dense(dtype=...) would)
        ki = self.W_i.variables['params']['kernel'][in_dim:]
        ko = self.W_o.variables['params']['kernel'][in_dim:]
        ku = self.W.variables['params']['kernel'][in_dim:]
        kf = self.W_f.variables['params']['kernel'][in_dim:]
        if self.dtype is not None:
            ki, ko, ku, kf = (k.astype(self.dtype) for k in (ki, ko, ku, kf))

        gth = _fused_gather(bgraph, bt)
        H = self.hidden_size

        def body(_, state):
            h, c = state
            # one fused gather of [h | h Kf | c] per iteration instead of
            # three [E, A, H] gathers (see _fused_gather)
            g = gth(jnp.concatenate([h, h @ kf, c], axis=-1))
            h_nei, fh_nei, c_nei = (g[..., :H], g[..., H:2 * H],
                                    g[..., 2 * H:])
            h_sum = h_nei.sum(axis=-2)
            i = jax.nn.sigmoid(xi + h_sum @ ki)
            o = jax.nn.sigmoid(xo + h_sum @ ko)
            u = jnp.tanh(xu + h_sum @ ku)
            f = jax.nn.sigmoid(xf + fh_nei)
            c_new = i * u + (f * c_nei).sum(axis=-2)
            h_new = o * jnp.tanh(c_new)
            return (zero_row0(h_new), zero_row0(c_new))

        return _unrolled(body, self.depth, (h0, h0), self.remat)


def _unrolled(body, depth: int, state, remat: bool = False):
    """Static unroll of the depth loop.

    ``depth`` is a hyperparameter (20 in the canonical config); unrolling lets
    XLA pipeline the gather → matmul chain across iterations instead of
    carrying a loop barrier.  For very deep configs fall back to fori_loop.

    With ``remat`` each iteration is rematerialised (``jax.checkpoint``):
    the backward then saves only the [N, H] carry per iteration instead of
    every gate/gather intermediate, and recomputes the gates on the way
    back.  Numerically exact.  Measured on TPU (round 4) this trades ~20%
    throughput for the memory in EVERY regime — the recomputed gates are
    gather-bound, not free — so it is a memory lever only, exposed as
    ``ModelConfig.loop_remat`` (default off) for configs that would
    otherwise OOM, and deliberately NOT tied to the decoder-scan ``remat``
    flag.
    """
    if depth <= 24:
        step = (jax.checkpoint(body, static_argnums=(0,)) if remat
                else body)
        for i in range(depth):
            state = step(i, state)
        return state
    # fori_loop passes a traced index — checkpoint without static args
    step = jax.checkpoint(body) if remat else body
    return jax.lax.fori_loop(0, depth, step, state)


def make_cell(rnn_type: str, hidden_size: int, depth: int, name=None,
              dtype=None, remat: bool = False):
    if rnn_type == 'GRU':
        return MPNGRUCell(hidden_size=hidden_size, depth=depth, name=name,
                          dtype=dtype, remat=remat)
    if rnn_type == 'LSTM':
        return MPNLSTMCell(hidden_size=hidden_size, depth=depth, name=name,
                           dtype=dtype, remat=remat)
    raise ValueError(f'unsupported rnn cell type {rnn_type}')
