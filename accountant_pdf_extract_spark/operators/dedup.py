"""Deduplication operators for web-scale corpora (prompt-mandated
first-class components): exact hash dedup, char-shingle Jaccard,
MinHash+LSH banding, SimHash.  All expressed with built-in Catalyst
expressions (hash/HOF/joins) — no Python in the hot path — so they
scale to the 10¹²-doc design point: shingle explosion is map-side,
banding is a groupBy on (band, bucket), candidate pairing is an
equi-join on bucket ids.

At 100 TB: shingles never materialize per-doc-pair (the classic
quadratic trap) — pairs only form through shared LSH buckets, and
buckets are hash-partitioned.  Exact dedup is one hash-agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def norm_text(col: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Explode-heavy ops (shingles, token votes) fan out 100–1000× per
    row; if the scan produced too few partitions (small local files),
    one cheap row-level repartition up front buys full-width fan-out.
    At scale the input has >= cores partitions and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: md5-of-normalized-text groups with member count and
    the kept (minimum) id — one hash aggregate, fully parallel."""
    return (
        df.select(F.col(id_col), F.md5(norm_text(F.col(text_col))).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_members"),
            F.min(id_col).alias("keep_id"),
        )
    )


def shingle_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """Exploded distinct (id, shingle) pairs — the base relation for
    Jaccard and MinHash.  substring with a dynamic start needs the
    SQL-expr form of transform()."""
    df = ensure_parallelism(df)
    out = df.select(
        F.col(id_col).alias("sid"),
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length(regexp_replace(lower(trim({text_col})), '\\\\s+', ' ')) - {k - 1}, 0)), "
                f"i -> substring(regexp_replace(lower(trim({text_col})), '\\\\s+', ' '), i, {k}))"
            )
        ).alias("shingle"),
    ).distinct()
    return out


def minhash_bands(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 5, bands: int = 4,
) -> DataFrame:
    """MinHash LSH: per (doc, band) the min over md5(band || shingle).
    Docs sharing a (band, bucket) are near-dup candidates.  One shuffle
    (the groupBy); band count trades recall vs candidate volume."""
    sh = shingle_df(df, text_col, id_col, k)
    banded = sh.join(
        df.sparkSession.range(bands).select(F.col("id").cast("int").alias("band")),
        how="cross",
    )
    return banded.groupBy("sid", "band").agg(
        F.min(F.md5(F.concat(F.col("band").cast("string"), F.lit("-"), F.col("shingle")))).alias("bucket")
    )


def minhash_candidate_pairs(bands_df: DataFrame) -> DataFrame:
    """Self-join on (band, bucket) → distinct candidate pairs a<b."""
    a = bands_df.select(F.col("sid").alias("a"), "band", "bucket")
    b = bands_df.select(F.col("sid").alias("b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 5, threshold_milli: int = 0,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate scoring: |A∩B|/|A∪B| in
    thousandths (integer — deterministic across engines).  The shingle
    self-join explodes quadratically on common shingles; at scale gate
    it behind ``minhash_candidate_pairs`` (compose: candidates ⋈ this)."""
    sh = shingle_df(df, text_col, id_col, k)
    sizes = sh.groupBy("sid").agg(F.count("*").alias("n"))
    a = sh.select(F.col("sid").alias("a"), "shingle")
    b = sh.select(F.col("sid").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
    )
    na = sizes.select(F.col("sid").alias("a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("sid").alias("b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            F.floor(
                F.lit(1000) * F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).cast("long").alias("jaccard_milli"),
        )
        .where(F.col("jaccard_milli") >= threshold_milli)
    )


def simhash16(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """16-bit SimHash from token md5 nibbles: each hex digit of
    md5(token) votes ±1 on its bit position; fingerprint packs the
    sign bits.  Pure Catalyst (explode + groupBy + bit math)."""
    df = ensure_parallelism(df)
    toks = df.select(
        F.col(id_col).alias("sid"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    pos = df.sparkSession.range(16).select(F.col("id").cast("int").alias("pos"))
    votes = (
        toks.crossJoin(pos)
        .select(
            "sid",
            "pos",
            (
                F.when(
                    F.instr(
                        F.lit("89abcdef"),
                        F.substring(F.md5(F.col("tok")), F.col("pos") + 1, 1),
                    )
                    > 0,
                    F.lit(1),
                ).otherwise(F.lit(-1))
            ).alias("vote"),
        )
        .groupBy("sid", "pos")
        .agg(F.sum("vote").alias("v"))
    )
    return votes.groupBy("sid").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(1, pos)")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("simhash")
    )
