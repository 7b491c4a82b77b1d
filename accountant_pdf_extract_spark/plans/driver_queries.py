"""Driver-checkable query battery (SURVEY.md §2 "driver key" column).

Every SQL-expressible operator gets a (PySpark DataFrame, DuckDB SQL)
pair over the read-only testdata tables; the driver compares row count
+ schema + order-insensitive value hash at sf0.01.  Column names are
aliased identically on both sides; numeric aggregates are computed in
DECIMAL (exact, associative) so hash comparison is deterministic
across engines.

Kernel-backed operators (the extraction pipeline itself) appear as
rows-only entries (no oracle) — their correctness gate is the golden
span-sequence fixtures under pytest (``BASELINE.json:15``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLE[name] = sql
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load()
    return dict(_ORACLE)


_LOADED = False


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    from accountant_pdf_extract_spark.plans import (  # noqa: F401
        q_relational,
        q_text,
        q_tpch,
        q_pipeline,
    )

    _LOADED = True


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
