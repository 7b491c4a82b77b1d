"""Deterministic sampling for training-data pipelines.

Random `df.sample()` is non-reproducible across engines, partitionings
and reruns — useless for train/test splits that must stay stable as a
10^12-doc corpus is re-processed.  Both operators here key on
``md5(id)``, which is uniform, engine-portable (identical in Spark and
DuckDB, so both are oracle-paired), and independent of partitioning:

* ``hash_split`` — tag each row train/test by comparing an md5 hex
  prefix against a threshold string ('cc' ≈ 0.8 of the space, since
  0xcc/0x100 = 204/256).  A document keeps its split forever, across
  reruns, engines and cluster sizes.
* ``stratified_sample`` — deterministic per-group top-k: rank rows
  inside each stratum by md5(id) and keep the first k.  One shuffle
  (the window partitionBy), no sampling RNG anywhere.

Both are map-side except the stratified window's single exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def split_tag(id_col: Column, train_hex_threshold: str = "cc") -> Column:
    """'train' when the md5 hex prefix of the id sorts below the
    threshold string, else 'test'.  len(threshold) hex chars compared;
    'cc' ≈ 80/20, 'e6' ≈ 90/10, '80' = 50/50."""
    t = train_hex_threshold.lower()
    if not t or any(c not in "0123456789abcdef" for c in t):
        # md5 hex is lowercase: an uppercase or non-hex threshold would
        # compare lexically against it and silently skew the split
        # fraction (e.g. 'CC' yields ~62/38, not 80/20)
        raise ValueError(
            f"train_hex_threshold must be lowercase hex, got "
            f"{train_hex_threshold!r}"
        )
    prefix = F.substring(F.md5(id_col.cast("string")), 1, len(t))
    return F.when(prefix < t, F.lit("train")).otherwise(F.lit("test"))


def hash_split(
    df: DataFrame, id_col: str, train_hex_threshold: str = "cc"
) -> DataFrame:
    """Append a deterministic 'split' column (train/test)."""
    return df.withColumn(
        "split", split_tag(F.col(id_col), train_hex_threshold)
    )


def stratified_sample(
    df: DataFrame, stratum_col: str, id_col: str, k: int
) -> DataFrame:
    """Deterministic k rows per stratum: order by (md5(id), id) inside
    each stratum and keep rank <= k.  Stable across reruns/engines;
    the id tiebreak keeps it total even under md5-prefix ties."""
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )
