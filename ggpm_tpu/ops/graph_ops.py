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

import jax.numpy as jnp


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
