"""Token-budget shard packing — the "fill shards of ~N tokens" step a
pretraining pipeline runs between curation and tokenization.

True bin packing is sequential; the scalable shape is first-fit in a
DETERMINISTIC order inside hash groups: docs are distributed into
``16`` md5 groups (engine-portable, partition-invariant), each group
is ordered by (md5(id), id), and a doc opens a new shard whenever the
running total of its predecessors crosses the budget.  Each group
packs independently under one window partition — 16-way parallel (use
2 hex chars → 256 groups when shards must be smaller than a group's
share), one exchange total, no RNG, no driver-side loop.

Shards can exceed the budget by at most one document (classic
first-fit slack); a doc larger than the budget gets a shard alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_token_shards(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    group_hex_chars: int = 1,
) -> DataFrame:
    """Append (pack_group, shard_id, shard_key): deterministic
    first-fit shard assignment with ~16^group_hex_chars parallel
    groups.  shard_key is globally unique (group + ordinal)."""
    h = F.md5(F.col(id_col).cast("string"))
    grp = F.substring(h, 1, group_hex_chars)
    out = df.withColumn("pack_group", grp)
    w = (
        Window.partitionBy("pack_group")
        .orderBy(h, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col).cast("long")).over(w)
    shard = F.floor((cum - F.col(token_col)) / F.lit(budget)).cast("long")
    return out.withColumn("shard_id", shard).withColumn(
        "shard_key", F.concat("pack_group", F.lit("-"), F.col("shard_id"))
    )
