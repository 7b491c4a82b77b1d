"""Developer harness mimicking the driver's correctness check: run
every queries() entry under Spark and its oracle_sql twin under DuckDB
on the same sf dir; compare row count, column names, and sorted value
tuples.  Usage:  python -m tools.parity [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or v.__class__.__name__ == "ndarray":
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def rows_of(cols, records):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(norm_cell(r[i]) for i in idx) for r in records
    )


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
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srec = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srec)} rows")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drec = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: cols spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        elif len(srec) != len(drec):
            print(f"FAIL {name}: rowcount spark={len(srec)} duck={len(drec)}")
            ok = False
        else:
            sr = rows_of(scols, srec)
            dr = rows_of(dcols, drec)
            if sr != dr:
                diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
                print(f"FAIL {name}: values differ; first diffs: {diff}")
                ok = False
        if ok:
            print(f"PASS {name}: {len(srec)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()


if __name__ == "__main__":
    main()
