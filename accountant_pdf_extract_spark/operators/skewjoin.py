"""Skew-tolerant join (J5 join-side, SURVEY.md §2.4): salt the skewed
(big) side's key, replicate the small side across all salt values, and
join on (key, salt) — the classic remedy when one hot key would pin a
single reducer at 100 TB.  AQE's skew-join split handles sort-merge
skew adaptively; this explicit form also covers hash joins and makes
the fan-out deterministic/testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# NO "cross": Spark treats a using-columns join with joinType 'cross'
# as INNER, silently dropping unmatched keys — not a cartesian product
_SAFE_HOW = {"inner", "left", "leftouter", "left_outer", "left_semi",
             "leftsemi", "semi", "left_anti", "leftanti", "anti"}

_SALT = "_sj_salt"  # internal; refuse inputs that already carry it


def _salt_expr(
    big: DataFrame,
    key: str,
    salt_buckets: int,
    tiebreak: str | Column | None,
) -> Column:
    """Deterministic per-row salt in [0, salt_buckets).

    The salt is a pure function of row CONTENT — never of physical
    position (``spark_partition_id`` / ``monotonically_increasing_id``
    are banned here): position-dependent salts are recomputed
    differently when a map task is retried after a fetch failure, so
    reducers that already fetched the old salt see rows duplicated or
    lost (the indeterminate-shuffle-key hazard, SPARK-23207 class).

    With a ``tiebreak`` (any unique-ish id column) the salt is
    ``pmod(xxhash64(key, tiebreak), buckets)`` — byte-identical hot
    rows still spread because their tiebreaks differ.  Without one we
    hash every column; then fully-identical duplicate rows co-locate
    (documented limitation — pass a tiebreak to break that case).
    """
    if tiebreak is not None:
        tb = F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak
        h = F.xxhash64(F.col(key), tb)
    else:
        h = F.xxhash64(*big.columns)
    return F.pmod(h, F.lit(salt_buckets)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
    tiebreak: str | Column | None = None,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side salted
    and the small side replicated ``salt_buckets``× (explode of a
    literal range — no driver-side loop).  Row-identical to the plain
    join for the supported join types.

    ``tiebreak`` names a unique(-ish) id column on ``big`` (or passes
    a Column expression); the salt then mixes it with the key so even
    byte-identical duplicates of a hot key spread across reducers.
    Any salt value is CORRECT for any row (the small side is
    replicated across every salt), so the choice of tiebreak affects
    distribution only, never results.  The salt is deterministic per
    row content — safe under partial stage retries, unlike
    position-derived salts (see ``_salt_expr``).  Without a tiebreak,
    all columns are hashed: distinct rows of a hot key still spread,
    but FULLY-identical duplicate rows share one salt bucket.

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
    if isinstance(tiebreak, str) and tiebreak not in big.columns:
        raise ValueError(
            f"tiebreak column {tiebreak!r} not found on the big side "
            f"(columns: {big.columns})"
        )
    salted_big = big.withColumn(
        _SALT, _salt_expr(big, key, salt_buckets, tiebreak)
    )
    # sequence of int literals already yields array<int> — no cast
    replicated_small = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_big.join(replicated_small, [key, _SALT], how).drop(_SALT)
