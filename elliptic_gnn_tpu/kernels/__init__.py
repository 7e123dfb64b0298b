from .segment import (  # noqa: F401
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
    spmm_edge_list,
)
from .ell import EllGraph, build_ell_graph, ell_spmm, ell_gat_aggregate  # noqa: F401


def spmm(g, x, compute_dtype=None):
    """Aggregation dispatch by encoding type:
      BsdaGraph        -> banded Pallas kernel when use_pallas_kernel,
                          else MXU batched dense chunk matmuls via XLA
      ShardedBsda      -> explicit halo-exchange shard_map variant
      EllGraph         -> pure-XLA gather ELL (fallback/oracle)
    """
    from .bsda import BsdaGraph, bsda_spmm

    if isinstance(g, BsdaGraph):
        if g.use_pallas_kernel:
            from .pallas_bsda import pallas_bsda_spmm

            return pallas_bsda_spmm(g, x, compute_dtype=compute_dtype)
        return bsda_spmm(g, x, compute_dtype=compute_dtype)
    from ..parallel.shardmap_step import ShardedBsda, sharded_bsda_spmm

    if isinstance(g, ShardedBsda):
        return sharded_bsda_spmm(g, x, compute_dtype=compute_dtype)
    # ELL fallback: the row gather is transaction-limited on TPU, so a
    # bf16 compute dtype saves nothing and costs a conversion pass
    # (~12% measured, kernels/ell.py) — run the fallback at full precision
    return ell_spmm(g, x, compute_dtype=None)


def gat_aggregate(g, x_proj, alpha_src, alpha_dst, negative_slope=0.2,
                  use_flash=False, fused_vjp=False):
    """GAT attention dispatch: dense chunk-pair attention for BsdaGraph
    (flash-style Pallas kernel on the forward-only eval path; manual
    closed-form backward via fused_vjp on the training path),
    explicit halo-exchange attention for ShardedBsda (inside shard_map),
    masked-row-softmax ELL otherwise."""
    from .bsda import BsdaGraph
    from .bsda_gat import bsda_gat_aggregate

    if isinstance(g, BsdaGraph):
        return bsda_gat_aggregate(
            g, x_proj, alpha_src, alpha_dst, negative_slope,
            use_flash=use_flash, fused_vjp=fused_vjp,
        )
    from ..parallel.shardmap_step import ShardedBsda, sharded_gat_attend

    if isinstance(g, ShardedBsda):
        return sharded_gat_attend(
            g, x_proj, alpha_src, alpha_dst, negative_slope
        )
    return ell_gat_aggregate(g, x_proj, alpha_src, alpha_dst, negative_slope)
