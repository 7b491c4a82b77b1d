"""Developer harness mimicking the driver's correctness check: run
every queries() entry under Spark and its oracle_sql twin under DuckDB
on the same sf dir; compare row count, column names, and a TYPED value
hash through the same pandas/Arrow conversion path the driver uses
(Spark ``toPandas()`` vs DuckDB ``.df()``).

The typed comparison is the important part: DuckDB surfaces
``sum(BIGINT)`` as HUGEINT -> float64 and DECIMAL as float64 through
``.df()``, while Spark returns int64 / Decimal objects.  Round 1's
string-based comparison collapsed those distinctions and disagreed with
the driver on 11 queries; this version distinguishes int-kind vs
float-kind vs Decimal exactly (integer *widths* are normalized — the
driver accepted Spark int32 rank vs DuckDB int64 rank).

Usage:  python -m tools.parity [sf_dir] [name ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    """Canonical typed token for one cell.

    - null-ish (None, NaN, NaT) -> ("null",)
    - integer kinds (any width, numpy or python) -> ("i", int)
    - float kinds -> ("f", exact repr)  [type-distinct from int]
    - Decimal -> ("dec", normalized string)  [type-distinct from float]
    - date/datetime -> ("t", isoformat)
    - bool -> ("b", value)
    - list/array -> ("a", tuple of tokens)
    - str/bytes -> ("s", value)
    """
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("null",)
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, datetime.datetime):
        # pandas NaT IS a datetime instance and isoformats to 'NaT' —
        # it must hit the null token, not ('t', 'NaT'), or a null
        # timestamp surfacing as None in one engine and NaT in the
        # other spuriously fails parity
        if v != v:
            return ("null",)
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("t", datetime.datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, (str, bytes)):
        return ("s", v)
    # numpy/list ARRAYS must be tupled before the scalar-kind checks —
    # a numeric ndarray has dtype.kind 'i'/'f' and float(v) would raise
    if isinstance(v, (list, tuple)) or getattr(v, "ndim", 0) > 0:
        return ("a", tuple(norm_cell(x) for x in v))
    # numpy scalars / pandas Timestamp
    kind = getattr(getattr(v, "dtype", None), "kind", None)
    if kind in ("i", "u"):
        return ("i", int(v))
    if kind == "f":
        f = float(v)
        return ("null",) if math.isnan(f) else ("f", repr(f))
    if kind == "b":
        return ("b", bool(v))
    if kind == "M" or hasattr(v, "isoformat"):
        try:
            if v != v:  # NaT
                return ("null",)
        except Exception:  # noqa: BLE001
            pass
        iso = v.isoformat()
        # normalize date-only isoformat to midnight datetime
        if len(iso) == 10:
            iso += "T00:00:00"
        return ("t", iso)
    return ("s", str(v))


def rows_of(df):
    """Sorted list of typed row tuples, columns ordered by name."""
    cols = sorted(df.columns)
    recs = [
        tuple(norm_cell(row[c]) for c in cols)
        for row in df[cols].to_dict("records")
    ]
    return sorted(recs)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__
    from accountant_pdf_extract_spark.session import get_spark

    spark = get_spark(app="parity", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )

    qs = __spark_entry__.queries()
    oracles = __spark_entry__.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name silently matching nothing would print a clean
        # "0 pass, 0 fail" — the opposite of what the caller wanted
        print(f"ERROR: unknown query names: {sorted(unknown)}")
        sys.exit(2)
    n_pass = n_fail = n_rows_only = 0
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spd = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            failed.append(name)
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(spd)} rows")
            n_rows_only += 1
            continue
        try:
            dpd = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            failed.append(name)
            continue
        ok = True
        if sorted(spd.columns) != sorted(dpd.columns):
            print(
                f"FAIL {name}: cols spark={sorted(spd.columns)} "
                f"duck={sorted(dpd.columns)}"
            )
            ok = False
        elif len(spd) != len(dpd):
            print(f"FAIL {name}: rowcount spark={len(spd)} duck={len(dpd)}")
            ok = False
        else:
            sr = rows_of(spd)
            dr = rows_of(dpd)
            if sr != dr:
                diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
                print(f"FAIL {name}: typed values differ; first diffs: {diff}")
                ok = False
        if ok:
            print(f"PASS {name}: {len(spd)} rows")
            n_pass += 1
        else:
            n_fail += 1
            failed.append(name)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if failed:
        print("failed:", " ".join(failed))
        spark.stop()
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
