"""Per-group top-k — the engine's sort/limit operator family.

Parity: the reference's fixed-capacity per-query result buffers
(/root/reference/include/svs/index/flat/flat.h:337-340 scratch sorter,
/root/reference/include/svs/index/ivf/sorted_buffer.h). Results are
returned nearest-first with ties broken by ascending id, matching the
reference's id-ordered Neighbor comparators
(/root/reference/include/svs/lib/neighbor.h).

Scale note: ``row_number`` over ``Window.partitionBy(group)`` shuffles
once on the group key and streams each partition — no full sort of the
child. Upstream operators (flat/ivf search) already reduce the child to
O(groups x k x partitions) rows via per-partition partial top-k (the
reference's tile-then-merge, flat.h:209), so this window is never the
scale bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
    ascending: bool = True,
    tie_col: str | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the k best rows per group, ranked 1..k (rank is BIGINT)."""
    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    if tie_col is not None:
        order.append(F.col(tie_col).asc())
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )
