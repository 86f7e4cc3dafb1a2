"""Core gather/scatter primitives for message passing on padded graphs.

TPU-native replacements for the reference's hot indexing ops
(/root/reference/ggpm/nnutils.py:65-70, 124-128).  All tensors follow the
index-0-is-padding convention: row 0 of every feature/state buffer is kept at
zero, so gathering a padded index contributes nothing to neighbour sums and no
masking is needed on the gather path.

These are XLA-friendly formulations (``jnp.take`` + reshape fuse into a single
dynamic-gather; the neighbour sum fuses into the consuming matmul).  A Pallas
fused gather+segment-sum kernel for the large-graph regime lives in
``ggpm_tpu.ops.pallas_gather``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gather_nd(source: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """``index_select_ND``: gather rows of ``source`` by an arbitrary-shape
    index tensor → shape ``index.shape + source.shape[1:]``."""
    return jnp.take(source, index, axis=0)


def nei_sum(h: jnp.ndarray, graph: jnp.ndarray) -> jnp.ndarray:
    """Sum neighbour states: ``h[graph].sum(-2)`` for a padded [N, A] index
    table.  Padding entries hit row 0 of ``h`` which is identically zero."""
    return jnp.take(h, graph, axis=0).sum(axis=-2)


def scatter_rows(buffer: jnp.ndarray, index: jnp.ndarray,
                 rows: jnp.ndarray) -> jnp.ndarray:
    """Write ``rows`` into ``buffer`` at ``index`` and restore the zero
    padding row (``index_scatter`` semantics, reference nnutils.py:124-128).
    Duplicate indices may only occur at the padding slot 0, which is re-zeroed
    afterwards."""
    out = buffer.at[index].set(rows)
    return out.at[0].set(0.0)


def zero_row0(h: jnp.ndarray) -> jnp.ndarray:
    return h.at[0].set(0.0)


# ---------------------------------------------------------------------------
# Transpose-table gathers: gather forward, GATHER backward.
#
# XLA derives the VJP of a row gather as a scatter-add, which on TPU
# serialises through HBM read-modify-write and dominated the encoder
# backward (52 of the 89 ms canonical-b240 step; runs/PROFILE_bwd.json).
# Because the index tables are static per batch, the host can precompute the
# TRANSPOSE table — for each source row, the positions that gather it — so
# the backward becomes another dense gather (measured 1.55x on the depth
# loop; exact to the bit on real batches).
#
# Row-0 (padding) occurrences are dropped from the table.  This is
# gradient-exact at every call site because either (a) the gathered source
# is a state buffer that passes through ``zero_row0`` whose VJP kills the
# row-0 cotangent anyway, or (b) the cotangent arriving at padding slots is
# identically zero (padding neighbour states are zero, so any product with
# them has zero gradient).  See tests/test_models.py grad-equivalence.
# ---------------------------------------------------------------------------


def build_transpose(graph: np.ndarray, num_src: int, k: int = None):
    """Host-side transpose of a padded [N, A] index table.

    Returns ``(t_idx, t_mask)``: for each source row ``m`` of the gathered
    tensor (``num_src`` rows), ``t_idx[m]`` lists the flat positions
    ``n * A + a`` with ``graph[n, a] == m`` (row 0 excluded), zero-padded to
    width ``k``; ``t_mask`` marks the real entries.  For ``bgraph`` the
    multiplicity of message m is deg(dst(m)) - 1 < A, so ``k=A`` is a
    static bound; pass ``k=None`` to size from the data.
    """
    g = np.asarray(graph)
    flat = g.ravel().astype(np.int64)
    pos = np.flatnonzero(flat)          # drop padding-row occurrences
    vals = flat[pos]
    order = np.argsort(vals, kind='stable')
    vals, pos = vals[order], pos[order]
    counts = np.bincount(vals, minlength=num_src) if vals.size else \
        np.zeros(num_src, np.int64)
    kmax = int(counts.max()) if counts.size else 0
    if k is None:
        k = max(1, kmax)
    if kmax > k:
        raise ValueError(f'transpose width {kmax} exceeds static bound {k}')
    t_idx = np.zeros((num_src, k), np.int32)
    t_mask = np.zeros((num_src, k), np.float32)
    if vals.size:
        first = np.searchsorted(vals, vals, side='left')
        col = np.arange(vals.size) - first
        t_idx[vals, col] = pos
        t_mask[vals, col] = 1.0
    return t_idx, t_mask


@jax.custom_vjp
def nei_sum_t(h, graph, t_idx, t_mask):
    """``nei_sum`` with a transpose-table backward (see module note)."""
    return jnp.take(h, graph, axis=0).sum(axis=-2)


def _nei_sum_t_fwd(h, graph, t_idx, t_mask):
    return nei_sum_t(h, graph, t_idx, t_mask), (graph.shape[1], t_idx, t_mask)


def _nei_sum_t_bwd(res, gout):
    a, t_idx, t_mask = res
    gh = (jnp.take(gout, t_idx // a, axis=0)
          * t_mask[..., None].astype(gout.dtype)).sum(axis=-2)
    return (gh, None, None, None)


nei_sum_t.defvjp(_nei_sum_t_fwd, _nei_sum_t_bwd)


@jax.custom_vjp
def gather_nd_t(h, graph, t_idx, t_mask):
    """Row gather by a padded [N, A] table with a transpose-table backward.

    Backward is exact wherever the padding-slot cotangent is zero or the
    row-0 source cotangent is dead (see module note)."""
    return jnp.take(h, graph, axis=0)


def _gather_nd_t_fwd(h, graph, t_idx, t_mask):
    return gather_nd_t(h, graph, t_idx, t_mask), (t_idx, t_mask)


def _gather_nd_t_bwd(res, gout):
    t_idx, t_mask = res
    g2 = gout.reshape((-1,) + gout.shape[2:])
    gh = (jnp.take(g2, t_idx, axis=0)
          * t_mask[..., None].astype(gout.dtype)).sum(axis=-2)
    return (gh, None, None, None)


gather_nd_t.defvjp(_gather_nd_t_fwd, _gather_nd_t_bwd)
