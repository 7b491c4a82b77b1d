"""Token-budget shard packing — the "fill shards of ~N tokens" step a
pretraining pipeline runs between curation and tokenization.

True bin packing is sequential; the scalable shape is budget-grid
assignment in a DETERMINISTIC order inside hash groups: docs are
distributed into ``16`` md5 groups (engine-portable,
partition-invariant), each group is ordered by (md5(id), id), and a
doc's shard is the budget-grid cell its predecessors' running total
falls in (``floor(prefix_sum / budget)``).  Each group packs
independently under one window partition — 16-way parallel (use
2 hex chars → 256 groups when shards must be smaller than a group's
share), one exchange total, no RNG, no driver-side loop.

Grid semantics, stated honestly (NOT classic first-fit): a shard can
exceed the budget by at most one document, BUT a doc whose
predecessor-sum crosses a grid line closes the previous shard early
(it may stay under-filled) and shard ids within a group may SKIP
values when a single doc spans several budget cells (a 25-token doc
under budget=10 advances the grid by 3).  Consumers must iterate the
DISTINCT shard_key values, never assume ids are dense or shards are
full.  In exchange the assignment is a pure prefix-sum expression —
no sequential state, identical on any engine.
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
    budget-grid shard assignment with ~16^group_hex_chars parallel
    groups.  shard_key is globally unique (group + ordinal).  NULL
    token counts pack as 0 tokens (the doc still gets a shard slot;
    silently dropping it would lose data, NULL-propagating would
    collapse every such doc into one phantom NULL shard)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    h = F.md5(F.col(id_col).cast("string"))
    grp = F.substring(h, 1, group_hex_chars)
    out = df.withColumn("pack_group", grp)
    w = (
        Window.partitionBy("pack_group")
        .orderBy(h, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = F.coalesce(F.col(token_col).cast("long"), F.lit(0))
    cum = F.sum(toks).over(w)
    shard = F.floor((cum - toks) / F.lit(budget)).cast("long")
    return out.withColumn("shard_id", shard).withColumn(
        "shard_key", F.concat("pack_group", F.lit("-"), F.col("shard_id"))
    )
