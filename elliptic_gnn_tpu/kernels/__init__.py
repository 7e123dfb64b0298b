from .segment import (  # noqa: F401
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
    spmm_edge_list,
)
from .ell import EllGraph, build_ell_graph, ell_spmm, ell_gat_aggregate  # noqa: F401
