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

# NO "cross": Spark treats a using-columns join with joinType 'cross'
# as INNER, silently dropping unmatched keys — not a cartesian product
_SAFE_HOW = {"inner", "left", "leftouter", "left_outer", "left_semi",
             "leftsemi", "semi", "left_anti", "leftanti", "anti"}

_SALT = "_sj_salt"  # internal; refuse inputs that already carry it


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side salted
    and the small side replicated ``salt_buckets``× (explode of a
    literal range — no driver-side loop).  Row-identical to the plain
    join for the supported join types.

    The salt mixes the row content WITH the physical row position
    (``spark_partition_id`` + ``monotonically_increasing_id``): the
    canonical skew case is a hot key whose rows are byte-IDENTICAL
    duplicates, and a content-only hash would send all of them to one
    reducer — exactly the straggler this operator exists to break.
    Any salt value is CORRECT for any row (the small side is
    replicated across every salt), so the position component affects
    distribution only, never results — task retries may re-salt a row
    differently and the join output is still row-identical.

    Right/full outer joins are refused: an unmatched small-side row
    exists ``salt_buckets`` times after replication, so the outer side
    would emit that many null-extended duplicates — use a plain join
    (small side can't be the skewed one anyway)."""
    if salt_buckets < 1:
        # pmod(x, 0) is NULL under ansi=off — every salt NULL, the
        # equi-join matches nothing, and an inner join silently
        # returns EMPTY instead of erroring
        raise ValueError(f"salt_buckets must be >= 1, got {salt_buckets}")
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in _SAFE_HOW
    }:
        raise ValueError(
            f"salted_join does not support how={how!r}: outer joins "
            "would duplicate unmatched small-side rows salt_buckets "
            "times, and 'cross' silently degrades to inner on a "
            "using-columns join"
        )
    if _SALT in big.columns or _SALT in small.columns:
        raise ValueError(
            f"inputs must not carry the internal column {_SALT!r} — "
            "it would be clobbered and dropped from the output"
        )
    salted_big = big.withColumn(
        _SALT,
        F.pmod(
            F.xxhash64(
                *big.columns,
                F.spark_partition_id(),
                F.monotonically_increasing_id(),
            ),
            F.lit(salt_buckets),
        ).cast("int"),
    )
    # sequence of int literals already yields array<int> — no cast
    replicated_small = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_big.join(replicated_small, [key, _SALT], how).drop(_SALT)
