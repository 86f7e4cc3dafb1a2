from .graph_ops import (build_transpose, gather_nd, gather_nd_t, nei_sum,
                        nei_sum_t, scatter_rows, zero_row0)

__all__ = ['build_transpose', 'gather_nd', 'gather_nd_t', 'nei_sum',
           'nei_sum_t', 'scatter_rows', 'zero_row0']
