"""Skew-tolerant join (J5 join-side, SURVEY.md §2.4): salt the skewed
(big) side's key, replicate the small side across all salt values, and
join on (key, salt) — the classic remedy when one hot key would pin a
single reducer at 100 TB.  AQE's skew-join split handles sort-merge
skew adaptively; this explicit form also covers hash joins and makes
the fan-out deterministic/testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side salted
    by a deterministic hash of its whole row and the small side
    replicated ``salt_buckets``× (explode of a literal range — no
    driver-side loop).  Result is row-identical to the plain join."""
    spark = big.sparkSession
    salted_big = big.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)
        ).cast("int"),
    )
    replicated_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return salted_big.join(replicated_small, [key, "_salt"], how).drop("_salt")
