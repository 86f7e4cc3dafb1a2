from .graph_ops import gather_nd, nei_sum, scatter_rows, zero_row0

__all__ = ['gather_nd', 'nei_sum', 'scatter_rows', 'zero_row0']
