"""Driver-gate simulation: run every queries() entry on Spark and its
oracle_sql() on DuckDB at an arbitrary SF dir, compare sorted value multisets
AND result-type families (so an oracle whose values match but whose output
type differs — e.g. DuckDB sum(BIGINT) silently widening to HUGEINT/int128
while Spark stays bigint, the round-3 q_curation_stats red cell — is caught
by this gate before the driver's value hash catches it).

Type families collapse integer/float widths (the driver hash tolerates
int32-vs-int64) but keep decimal distinct from int/float, which is exactly
the HUGEINT class of bug.

Usage: python tools/check_parity.py [sf_dir] [name_substring ...]
       [--out=PARITY.json]

--out writes a machine-readable per-query record (status ok/fail/rows_only,
row count, wall seconds, sf_dir) — committed each round as PARITY_rN.json so
the driver-verified vs self-verified split is self-documenting (round-4
verdict item #7).
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import json  # noqa: E402
import time  # noqa: E402

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402

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


def _pa_family(t) -> str:
    """Collapse a pyarrow type into a comparison family: int widths merge,
    float widths merge, decimal keeps (precision, scale) so HUGEINT
    (decimal128(38,0) over Arrow) can never alias a plain int."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_pa_family(t.value_type)}>"
    if pa.types.is_struct(t):
        return (
            "struct<"
            + ",".join(f"{f.name}:{_pa_family(f.type)}" for f in t)
            + ">"
        )
    return str(t)


def _spark_family(dt) -> str:
    """Map a Spark DataType onto the same family strings as _pa_family."""
    from pyspark.sql import types as T

    scalar = {
        T.ByteType: "int", T.ShortType: "int", T.IntegerType: "int",
        T.LongType: "int", T.FloatType: "float", T.DoubleType: "float",
        T.StringType: "string", T.BooleanType: "bool",
        T.BinaryType: "binary", T.DateType: "date",
        T.TimestampType: "timestamp", T.TimestampNTZType: "timestamp",
    }
    for cls, fam in scalar.items():
        if isinstance(dt, cls):
            return fam
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"list<{_spark_family(dt.elementType)}>"
    if isinstance(dt, T.StructType):
        return (
            "struct<"
            + ",".join(f"{f.name}:{_spark_family(f.dataType)}" for f in dt)
            + ">"
        )
    return dt.simpleString()


def _type_diffs(sdf_schema, d_schema):
    """Per-column family mismatches between a Spark schema and a dict of
    {col: pyarrow type} from the oracle result."""
    spark_fams = {f.name: _spark_family(f.dataType) for f in sdf_schema}
    diffs = []
    for col, pa_type in d_schema.items():
        sf, df = spark_fams.get(col), _pa_family(pa_type)
        if sf is not None and sf != df:
            diffs.append(f"{col}: spark={sf} oracle={df}")
    return diffs


def _multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=_sort_key
    )


def main() -> int:
    argv = sys.argv[1:]
    out_path = None
    for a in list(argv):
        if a.startswith("--out="):
            out_path = a[len("--out="):]
            argv.remove(a)
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    filters = argv[1:]

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
    records = {}
    for name in sorted(queries):
        if filters and not any(f in name for f in filters):
            continue
        fn = queries[name]
        t0 = time.monotonic()
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            records[name] = {
                "status": "rows_only",
                "rows": n,
                "sec": round(time.monotonic() - t0, 2),
            }
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
            records[name] = {"status": "fail", "why": "columns"}
            print(f"FAIL {name}: columns {s_cols} vs {d_cols}")
            continue
        # type gate: LIMIT 0 re-execution is cheap and yields the oracle's
        # Arrow schema without re-materializing the result
        d_schema_tbl = con.execute(
            f"SELECT * FROM ({oracles[name]}) LIMIT 0"
        ).arrow()
        d_schema = {
            c: d_schema_tbl.schema.field(c).type
            for c in d_schema_tbl.column_names
        }
        tdiffs = _type_diffs(sdf.schema, d_schema)
        if tdiffs:
            failed.append(name)
            records[name] = {"status": "fail", "why": "types"}
            print(f"FAIL {name}: result-type divergence: {'; '.join(tdiffs)}")
            continue
        got, want = _multiset(s_rows, s_cols), _multiset(d_rows, d_cols)
        if got != want:
            failed.append(name)
            records[name] = {"status": "fail", "why": "values"}
            diff = next(
                ((a, b) for a, b in zip(got, want) if a != b),
                (f"len {len(got)}", f"len {len(want)}"),
            )
            print(f"FAIL {name}: first diff {diff}")
        else:
            records[name] = {
                "status": "ok",
                "rows": len(got),
                "sec": round(time.monotonic() - t0, 2),
            }
            print(
                f"OK   {name}: {len(got)} rows"
                f" [{time.monotonic() - t0:.1f}s]",
                flush=True,
            )
    spark.stop()
    if out_path:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(records),
                    "n_failed": len(failed),
                    "all_ok": not failed,
                    "queries": records,
                },
                f,
                indent=1,
                sort_keys=True,
            )
            f.write("\n")
    print(f"\n{'ALL OK' if not failed else 'FAILURES: ' + ', '.join(failed)}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
