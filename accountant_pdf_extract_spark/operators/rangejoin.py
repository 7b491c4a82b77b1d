"""Scale-safe range (interval) join: points ⋈ intervals on
``lo <= point <= hi``.

Spark plans a plain non-equi join as BroadcastNestedLoopJoin — O(n·m)
row comparisons and a broadcast of one whole side: the classic
100-TB wall.  The distributed shape used here (same idea as Spark's
Photon/Databricks range-join optimization and TimescaleDB chunk
exclusion — public technique) converts the containment predicate into
an EQUI join:

1. bucket every point into ``floor(point / bucket_width)``;
2. explode every interval into the buckets it overlaps
   (``sequence(floor(lo/w), floor(hi/w))``);
3. shuffle-equi-join on the bucket id and post-filter the exact
   ``BETWEEN`` — each (point, interval) pair meets in EXACTLY ONE
   bucket (the point's), so no dedup is needed.

Degenerate intervals spanning many buckets would fan out step 2; they
route through a broadcast nested-loop path instead (they must be rare
— the knob documents the contract).  Pick ``bucket_width`` ≈ the
median interval length: fan-out stays ~2× and the equi-join carries
the whole load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    max_span_buckets: int = 64,
) -> DataFrame:
    """Inner join of ``points`` with ``intervals`` where
    ``lo_col <= point_col <= hi_col`` (numeric columns; cast timestamps
    to epoch first).  Column names must be disjoint.  Intervals wider
    than ``max_span_buckets * bucket_width`` take the broadcast
    nested-loop path — they are expected to be a rare tail; if most
    intervals are long, raise ``bucket_width`` instead."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"points/intervals share columns {sorted(overlap)}; rename first"
        )
    reserved = {"_rj_b", "_rj_lo_b", "_rj_hi_b"} & (
        set(points.columns) | set(intervals.columns)
    )
    if reserved:
        # withColumn would silently OVERWRITE these and the internal
        # drop() would then delete caller data
        raise ValueError(
            f"columns {sorted(reserved)} are reserved by range_join; "
            "rename them first"
        )

    w = F.lit(bucket_width)
    valid = intervals.where(F.col(lo_col) <= F.col(hi_col))
    spans = valid.withColumn(
        "_rj_lo_b", F.floor(F.col(lo_col) / w)
    ).withColumn("_rj_hi_b", F.floor(F.col(hi_col) / w))
    short = spans.where(
        F.col("_rj_hi_b") - F.col("_rj_lo_b") < max_span_buckets
    )
    long_tail = spans.where(
        F.col("_rj_hi_b") - F.col("_rj_lo_b") >= max_span_buckets
    ).drop("_rj_lo_b", "_rj_hi_b")

    pb = points.withColumn("_rj_b", F.floor(F.col(point_col) / w))
    exploded = short.withColumn(
        "_rj_b", F.explode(F.sequence(F.col("_rj_lo_b"), F.col("_rj_hi_b")))
    ).drop("_rj_lo_b", "_rj_hi_b")
    matched = (
        pb.join(exploded, "_rj_b")
        .where(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("_rj_b")
    )

    # rare long intervals: broadcast them through the non-equi path —
    # tiny by contract, so the nested loop touches few interval rows
    long_matched = points.join(
        F.broadcast(long_tail),
        F.col(point_col).between(F.col(lo_col), F.col(hi_col)),
    )
    return matched.unionByName(long_matched.select(*matched.columns))
