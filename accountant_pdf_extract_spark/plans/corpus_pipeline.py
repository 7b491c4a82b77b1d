"""End-to-end training-corpus pipeline: the composition a large-scale
data-curation job actually runs —

    extract (interleaved docs → ordered text spans)
      → per-doc text assembly (concat_ws over ordered spans)
      → fingerprint + exact dedup (keep the min doc_id per content hash)
      → quality scoring + threshold filter
      → (doc_id, text, n_tokens, quality_score) corpus table

Shuffle budget: the extraction exchange (salted), one groupBy for the
per-doc text assembly, one for the dedup hash — each on a different
key, all hash-partitioned; at 100 TB the dedup agg is the small one
(one row per doc) and the quality filter is free (map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from accountant_pdf_extract_spark.operators import textstats
from accountant_pdf_extract_spark.operators.dedup import norm_text
from accountant_pdf_extract_spark.plans.pipeline import extract


def doc_text(flat: DataFrame) -> DataFrame:
    """Ordered span text per doc, newline-joined (X2 collect)."""
    return (
        flat.where(F.col("kind") == "text")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("order", "text"))),
                    lambda s: s["text"],
                ),
            ).alias("text")
        )
    )


def curate(
    docs: DataFrame,
    salt_buckets: int = 1024,
    num_partitions: int | None = None,
    min_quality: float = 0.3,
) -> DataFrame:
    """Interleaved docs → deduped, quality-filtered corpus table."""
    flat = extract(docs, salt_buckets=salt_buckets, num_partitions=num_partitions)
    texts = doc_text(flat)

    w = Window.partitionBy(F.md5(norm_text(F.col("text")))).orderBy("doc_id")
    deduped = (
        texts.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    scored = textstats.quality_features(deduped)
    return scored.where(F.col("quality_score") >= min_quality).select(
        "doc_id", "text", "n_tokens", "quality_score"
    )
