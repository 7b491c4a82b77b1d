"""JSONL corpus export/import — the interchange format tokenizer and
training pipelines consume.  Deterministic content-addressed sharding
so re-exports are reproducible regardless of input partitioning.

Scale notes: the shard column is a pure hash of the key (no global
sort, no driver-side row counting); ``read_jsonl`` requires an
explicit schema — JSON schema inference is a full extra pass over the
data, never acceptable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

SHARD_COL = "_shard"


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    shard_key: str = "doc_id",
    compression: str = "gzip",
) -> None:
    """Export ``df`` as ``_shard=<k>/*.json.gz`` newline-delimited
    JSON.  shard = pmod(xxhash64(key), n_shards): content-addressed,
    so the same row always lands in the same shard (diff/resume
    friendly) and adding shards doesn't reshuffle unrelated rows'
    bytes through the driver.  One exchange (hash repartition on the
    shard id) so each shard is written by one task as one file."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if SHARD_COL in df.columns:
        raise ValueError(f"input already carries {SHARD_COL}")
    (
        df.withColumn(
            SHARD_COL, F.pmod(F.xxhash64(F.col(shard_key)), F.lit(n_shards))
        )
        .repartition(n_shards, SHARD_COL)
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
        .option("compression", compression)
        .json(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Read a JSONL export back with an EXPLICIT schema (inference is
    a second full scan — refused by design) in FAILFAST mode: a
    corrupt/truncated shard line raises instead of silently becoming
    an all-null row (PERMISSIVE, Spark's default, would swallow it —
    the opposite of an interchange format's lossless contract).  The
    shard partition column is dropped; column order follows the given
    schema."""
    return (
        spark.read.schema(schema)
        .option("mode", "FAILFAST")
        .json(path)
        .select(*[f.name for f in schema.fields])
    )
