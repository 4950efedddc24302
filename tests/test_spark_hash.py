"""Pin the pure-Python hash replicas bit-exactly against Spark's built-ins.

These replicas underpin every materialized oracle that must reproduce LSH
banding / MinHash buckets / mention ids (tools/gen_oracles.py), so any
divergence here invalidates the oracle tables.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ner_backend_spark.core.spark_hash import (
    spark_hash,
    spark_hash_int_array,
    spark_hash_long_array,
    spark_xxhash64,
)

STRINGS = [
    "",
    "a",
    "abc",
    "abcd",
    "abcde",
    "spark",
    "^spark$",
    "the quick brown fox jumps over the lazy dog",
    "Zoë Faulkner 🌟 München 東京 دبي",
    "x" * 100,
]

INTS = [0, 1, -1, 42, -42, 2**31 - 1, -(2**31)]
LONGS = [0, 2**31, -(2**31) - 1, 2**63 - 1, -(2**63), 123456789012345]


def test_hash_strings(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], ["s"])
    got = [r[0] for r in df.select(F.hash("s")).collect()]
    want = [spark_hash(s) for s in STRINGS]
    assert got == want


def test_hash_ints_and_longs(spark):
    df = spark.createDataFrame(
        [(i,) for i in INTS],
        StructType([StructField("i", IntegerType())]),
    )
    assert [r[0] for r in df.select(F.hash("i")).collect()] == [
        spark_hash(("int", i)) for i in INTS
    ]
    df = spark.createDataFrame(
        [(i,) for i in LONGS],
        StructType([StructField("i", LongType())]),
    )
    assert [r[0] for r in df.select(F.hash("i")).collect()] == [
        spark_hash(("long", i)) for i in LONGS
    ]


def test_hash_string_with_literal_int_seed_fold(spark):
    # the KG LSH signature shape: hash(trigram, i)
    df = spark.createDataFrame([(s,) for s in STRINGS], ["s"])
    for i in (0, 3, 14):
        got = [r[0] for r in df.select(F.expr(f"hash(s, {i})")).collect()]
        want = [spark_hash(s, ("int", i)) for s in STRINGS]
        assert got == want, f"mismatch at fold int {i}"


def test_hash_int_and_long_arrays(spark):
    arrays = [[0, 1, 2], [-5, 2**30, 7], [], [42]]
    df = spark.createDataFrame(
        [(a,) for a in arrays],
        StructType([StructField("a", ArrayType(IntegerType()))]),
    )
    assert [r[0] for r in df.select(F.hash("a")).collect()] == [
        spark_hash_int_array(a) for a in arrays
    ]
    larrays = [[0, 2**40, -(2**40)], [1, 2, 3, 4], []]
    df = spark.createDataFrame(
        [(a,) for a in larrays],
        StructType([StructField("a", ArrayType(LongType()))]),
    )
    assert [r[0] for r in df.select(F.hash("a")).collect()] == [
        spark_hash_long_array(a) for a in larrays
    ]


def test_xxhash64_strings_and_folds(spark):
    df = spark.createDataFrame(
        [(s, t) for s in STRINGS[:6] for t in STRINGS[:6]], ["s", "t"]
    )
    rows = df.select(
        F.xxhash64("s"), F.xxhash64("s", "t")
    ).collect()
    pairs = [(s, t) for s in STRINGS[:6] for t in STRINGS[:6]]
    for (s, t), row in zip(pairs, rows):
        assert row[0] == spark_xxhash64(s)
        assert row[1] == spark_xxhash64(s, t)


def test_xxhash64_longs(spark):
    df = spark.createDataFrame(
        [(i,) for i in LONGS],
        StructType([StructField("i", LongType())]),
    )
    # exact per-type check: LongType always hashes as long
    from ner_backend_spark.core.spark_hash import _signed64, xxh64_long

    got = [r[0] for r in df.select(F.xxhash64("i")).collect()]
    want = [_signed64(xxh64_long(i, 42)) for i in LONGS]
    assert got == want


def test_mention_id_shape(spark):
    # xxhash64(label, text): the mention-id construction in spark/kg.py
    rows = [("kw_spark", "spark"), ("kw_j", "join"), ("kw_j", "Zoë")]
    df = spark.createDataFrame(rows, ["label", "text"])
    got = [r[0] for r in df.select(F.xxhash64("label", "text")).collect()]
    assert got == [spark_xxhash64(l, t) for l, t in rows]
