"""Driver-gate simulation: run every queries() entry on Spark and its
oracle_sql() on DuckDB at an arbitrary SF dir, compare sorted value multisets.

Usage: python tools/check_parity.py [sf_dir] [name_substring ...]
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import time  # noqa: E402

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def _sort_key(t):
    # NULL-safe, type-heterogeneous ordering: sort by (is-null, str(v)) so a
    # NULL in a numeric column can't make sorted() compare str vs int
    return tuple((v is None, str(v)) for v in t)


def _multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=_sort_key
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]

    # pin the materialized oracle tables to the SF under test — without
    # this, oracle_sql() defaults them to sf0.01 and every materialized
    # query spuriously FAILs at any other SF (round-3 review finding)
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF", sf_dir)

    from ner_backend_spark.spark.session import get_spark

    spark = get_spark("parity-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )

    oracles = entry_mod.oracle_sql()
    queries = entry_mod.queries()
    failed = []
    for name in sorted(queries):
        if filters and not any(f in name for f in filters):
            continue
        fn = queries[name]
        t0 = time.monotonic()
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            print(
                f"ROWS_ONLY {name}: {n} rows"
                f" [{time.monotonic() - t0:.1f}s]",
                flush=True,
            )
            continue
        sdf = fn(spark, sf_dir)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        res = con.execute(oracles[name])
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
        if sorted(s_cols) != sorted(d_cols):
            failed.append(name)
            print(f"FAIL {name}: columns {s_cols} vs {d_cols}")
            continue
        got, want = _multiset(s_rows, s_cols), _multiset(d_rows, d_cols)
        if got != want:
            failed.append(name)
            diff = next(
                ((a, b) for a, b in zip(got, want) if a != b),
                (f"len {len(got)}", f"len {len(want)}"),
            )
            print(f"FAIL {name}: first diff {diff}")
        else:
            print(
                f"OK   {name}: {len(got)} rows"
                f" [{time.monotonic() - t0:.1f}s]",
                flush=True,
            )
    spark.stop()
    print(f"\n{'ALL OK' if not failed else 'FAILURES: ' + ', '.join(failed)}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
