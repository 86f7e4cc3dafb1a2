"""Unit equivalence for HierDecoder._sparse_local vs _sparse_direct.

The propose scan's frontier-cluster refresh (hier_decoder.hdec_propose)
uses ``_sparse_local`` — the hoisted-traffic restructure whose premise is
that rows OUTSIDE the update set never change across iterations, so their
neighbor contributions can be gathered once and the full-state scatter
deferred to the end.  The hier turbo suites verify this end-to-end; this
test pins the helper itself bit-exactly on adversarial index patterns:
neighbors inside AND outside the update set, padding (row-0) lanes, and
bg entries pointing at other updated rows (the in-set feedback path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggpm_tpu.models.hier_decoder import HierDecoder
from ggpm_tpu.models.rnn import MPNGRUCell, MPNLSTMCell

H = 16
NE = 40          # state rows
R = 10           # update-set size
NB = 4           # neighbor slots


def _case(seed):
    rng = np.random.default_rng(seed)
    # rows: unique nonzero update set with one padding (0) lane
    rows = np.zeros(R, np.int32)
    rows[: R - 1] = rng.choice(np.arange(1, NE), size=R - 1, replace=False)
    # bg: mix of in-set rows, out-of-set rows, and padding zeros
    bg = rng.integers(0, NE, size=(R, NB)).astype(np.int32)
    bg[rng.random(size=bg.shape) < 0.3] = 0
    bg[:3, 0] = rows[:3]          # guaranteed in-set feedback edges
    x = rng.standard_normal((R, 2 * H)).astype(np.float32)
    return jnp.asarray(rows), jnp.asarray(bg), jnp.asarray(x)


@pytest.mark.parametrize('cell_cls,n_iter', [(MPNGRUCell, 1),
                                             (MPNGRUCell, 3),
                                             (MPNLSTMCell, 1),
                                             (MPNLSTMCell, 3)])
def test_sparse_local_matches_direct(cell_cls, n_iter):
    rows, bg, x = _case(7 + n_iter)
    cell = cell_cls(hidden_size=H, depth=1)
    params = cell.init(jax.random.PRNGKey(0), x, bg)
    rng = np.random.default_rng(3)
    state = tuple(
        jnp.asarray(rng.standard_normal((NE, H)).astype(np.float32))
        .at[0].set(0.0)
        for _ in range(2 if cell_cls is MPNLSTMCell else 1))

    def run(method):
        return cell.apply(
            params, method=lambda c: method(None, c, state, rows, x, bg,
                                            n_iter))

    out_d = run(HierDecoder._sparse_direct)
    out_l = run(HierDecoder._sparse_local)
    for a, b in zip(out_d, out_l):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.abs(np.asarray(a)).mean() > 1e-4   # non-trivial update
