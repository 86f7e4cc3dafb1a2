"""Pallas TPU kernel: fused neighbour gather + segment sum.

The hot non-matmul op of the message-passing stack is
``nei_sum(h, graph) = h[graph].sum(-2)`` — a padded-index row gather followed
by a small reduction (reference hot op ``index_select_ND`` + sum,
/root/reference/ggpm/nnutils.py:65-70 used at every RNN depth iteration).

XLA lowers this to dynamic-gather + reduce, materialising an [N, A, H]
intermediate in HBM for large graphs.  This kernel streams directly from the
state table in HBM into VMEM accumulators using scalar-prefetched indices and
double-buffered DMA (pallas_guide.md §12, §17), never materialising the
gathered tensor.

Use ``nei_sum_pallas(h, graph)`` — falls back to the XLA formulation on
non-TPU backends or when shapes are too small to benefit.

Measured status (TPU v5e): bit-exact vs the XLA formulation.  At this
model's shapes (≤1k messages, A≤8) the kernel is DMA-latency-bound and the
XLA gather wins, so the XLA path is the default; the kernel is the building
block for the large-graph regime (≥100k messages) and future fused
gather+cell kernels.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

TILE_N = 8           # nodes per grid step (one sublane group)


def _kernel(idx_ref,            # scalar-prefetch: [N, A] int32 indices
            h_hbm,              # [M, H] state table (HBM)
            out_ref,            # [TILE_N, H] output tile (VMEM)
            scratch, sems):
    """Grid step i: accumulate the A neighbour rows of TILE_N nodes.

    Double buffering over the (node, neighbour) DMA stream: while row k is
    being summed, row k+1 is in flight.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    a_width = idx_ref.shape[1]
    total = TILE_N * a_width

    def row_of(k):
        node = i * TILE_N + k // a_width
        return idx_ref[node, k % a_width]

    def dma(slot, k):
        # HBM f32 tables tile in (8, 128) blocks: DMA the aligned 8-row
        # block containing the wanted row, select the row in VMEM
        row = row_of(k)
        base = pl.multiple_of((row // 8) * 8, 8)
        return pltpu.make_async_copy(
            h_hbm.at[pl.ds(base, 8), :],
            scratch.at[slot],
            sems.at[slot],
        )

    out_ref[...] = jnp.zeros_like(out_ref)
    dma(0, 0).start()

    def body(k, _):
        slot = k % 2
        nxt = (k + 1) % 2

        @pl.when(k + 1 < total)
        def _():
            dma(nxt, k + 1).start()

        dma(slot, k).wait()
        node_in_tile = k // a_width
        row = row_of(k)
        # padding rows (index 0) contribute zero by convention; the state
        # table's row 0 is kept zero by the caller, so no masking is needed
        out_ref[pl.ds(node_in_tile, 1), :] += scratch[slot, pl.ds(row % 8, 1), :]
        return 0

    jax.lax.fori_loop(0, total, body, 0)


def _nei_sum_pallas_impl(h: jnp.ndarray, graph: jnp.ndarray) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, a = graph.shape
    m, hdim = h.shape
    n_pad = ((n + TILE_N - 1) // TILE_N) * TILE_N
    if n_pad != n:
        graph = jnp.pad(graph, ((0, n_pad - n), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // TILE_N,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TILE_N, hdim), lambda i, idx: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 8, hdim), h.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, hdim), h.dtype),
        grid_spec=grid_spec,
    )(graph.astype(jnp.int32), h)
    return out[:n]


def nei_sum_pallas(h: jnp.ndarray, graph: jnp.ndarray,
                   force: bool = False) -> jnp.ndarray:
    """Fused neighbour-sum.  Uses the Pallas kernel on TPU for large state
    tables; otherwise the XLA gather+sum (which fuses fine at small sizes)."""
    if not force:
        on_tpu = jax.default_backend() == 'tpu'
        if not on_tpu or h.shape[0] * h.shape[1] < 1 << 18:
            return jnp.take(h, graph, axis=0).sum(axis=-2)
    return _nei_sum_pallas_impl(h, graph)
