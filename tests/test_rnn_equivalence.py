"""The encoder depth loop (MPN*Cell.__call__) is an algebraic restructure of
the per-step ``cell`` math (loop-invariant x-projections hoisted; per-neighbour
gate projections computed as project-once-then-gather).  These tests pin the
restructure to the direct formulation, which itself mirrors the reference
recurrences (/root/reference/ggpm/rnn.py:25-59, 96-108)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggpm_tpu.models.rnn import MPNGRUCell, MPNLSTMCell
from ggpm_tpu.ops import gather_nd, zero_row0

E, A, H, IN, DEPTH = 37, 5, 16, 23, 7


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    fmess = jnp.asarray(rng.standard_normal((E, IN)), dtype=jnp.float32)
    bg = jnp.asarray(rng.integers(0, E, (E, A)), dtype=jnp.int32)
    bg = bg.at[:, 3:].set(0)        # padding slots hit the zero row
    bg = bg.at[0].set(0)
    return fmess, bg


def _direct_loop(cell_mod, n_state, fmess, bg):
    """Depth loop exactly as written in round 1: gather raw state, apply the
    unchanged ``cell`` method, zero the padding row."""
    state = tuple(jnp.zeros((E, H)) for _ in range(n_state))
    for _ in range(DEPTH):
        nei = tuple(gather_nd(s, bg) for s in state)
        state = tuple(zero_row0(s) for s in cell_mod.cell(fmess, nei))
    return state


@pytest.mark.parametrize('cell_cls,n_state', [(MPNGRUCell, 1),
                                              (MPNLSTMCell, 2)])
def test_restructured_depth_loop_matches_cell(cell_cls, n_state):
    fmess, bg = _inputs()
    cell = cell_cls(hidden_size=H, depth=DEPTH)
    params = cell.init(jax.random.PRNGKey(0), fmess, bg)
    prod = cell.apply(params, fmess, bg)
    ref = cell.apply(params, fmess, bg,
                     method=lambda c, f, g: _direct_loop(c, n_state, f, g))
    for a, b in zip(prod, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
        assert np.abs(np.asarray(a)).mean() > 1e-3   # non-trivial state


@pytest.mark.parametrize('cell_cls', [MPNGRUCell, MPNLSTMCell])
def test_padding_row_stays_zero(cell_cls):
    fmess, bg = _inputs(1)
    cell = cell_cls(hidden_size=H, depth=DEPTH)
    params = cell.init(jax.random.PRNGKey(1), fmess, bg)
    for s in cell.apply(params, fmess, bg):
        np.testing.assert_array_equal(np.asarray(s[0]), 0.0)
