"""Sequence packing (distributed prefix sum), event funnel, and
Unicode-script profile tests."""

import random

from pyspark.sql import functions as F

from ner_backend_spark.spark.packing import pack_sequences
from ner_backend_spark.spark.textstats import add_script_profile


def test_pack_sequences_matches_python_prefix_sum(spark):
    # sparse, shuffled ids across many chunks (chunk=4) vs the naive
    # sequential layout
    rng = random.Random(11)
    ids = sorted(rng.sample(range(1000), 60))
    toks = {i: rng.randrange(0, 300) for i in ids}
    rows = [(i, toks[i]) for i in ids]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {
        r["doc_id"]: (r["n_tok"], r["start_off"], r["seq_id"])
        for r in pack_sequences(
            df, "doc_id", "n_tok", seq_len=128, chunk=4
        ).collect()
    }
    off = 0
    for i in ids:
        assert got[i] == (toks[i], off, off // 128), i
        off += toks[i]
    assert len(got) == len(ids)


def test_pack_sequences_prefix_join_broadcasts(spark):
    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37).alias("n_tok")
    )
    out = pack_sequences(df, "doc_id", "n_tok", seq_len=64, chunk=50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the chunk-offset table joins back as a broadcast; the data path
    # never sorts globally
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_event_funnel_stages(spark):
    import datetime as dt

    t = dt.datetime(2026, 1, 1)
    s = lambda m: t + dt.timedelta(minutes=m)  # noqa: E731
    rows = [
        # u1 completes the funnel in order
        (1, s(0), "view"), (1, s(5), "click"), (1, s(9), "purchase"),
        # u2 clicks BEFORE viewing -> click doesn't count; stage 1
        (2, s(10), "click"), (2, s(11), "view"),
        # u3 views + clicks, purchase precedes the click -> stage 2
        (3, s(0), "view"), (3, s(2), "purchase"), (3, s(4), "click"),
        # u4 never views -> absent from the funnel
        (4, s(0), "click"), (4, s(1), "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    # the operator shape from _q_event_funnel, on synthetic events
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    stage = (
        F.lit(1)
        + F.col("t_click").isNotNull().cast("int")
        + F.col("t_purchase").isNotNull().cast("int")
    )
    out = {
        r["user_id"]: r["stage"]
        for r in v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", stage.alias("stage"))
        .collect()
    }
    assert out == {1: 3, 2: 1, 3: 2}


def test_script_profile_multiscript(spark):
    df = spark.createDataFrame(
        [
            (1, "hello world 42"),
            (2, "Привет мир"),
            (3, "你好世界"),
            (4, "1234 56"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_latin"], r["n_digit"], r["n_cyrillic"], r["n_cjk"],
            r["dominant_script"],
        )
        for r in add_script_profile(df).collect()
    }
    assert got[1] == (10, 2, 0, 0, "latin")
    assert got[2] == (0, 0, 9, 0, "cyrillic")
    assert got[3] == (0, 0, 0, 4, "cjk")
    assert got[4] == (0, 6, 0, 0, "digit")
    # empty text: all-zero counts tie-break to latin by the fixed order
    assert got[5] == (0, 0, 0, 0, "latin")


def test_readability_known_values(spark):
    from ner_backend_spark.spark.textstats import add_readability

    df = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!"),
            (2, ""),
            (3, "no terminal punctuation here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_words"], r["n_sentences"], r["n_syllables"], r["flesch"]
        )
        for r in add_readability(df).collect()
    }
    # doc 1: 6 words, 2 sentence runs, vowel groups:
    # "the cat sat. the dog ran!" -> e,a,a,e,o,a = 6
    w, s, syl = 6, 2, 6
    flesch = round(206.835 - 1.015 * (w / s) - 84.6 * (syl / w), 4)
    assert got[1] == (w, s, syl, flesch)
    # empty doc: floors keep the score finite
    assert got[2][0:3] == (0, 0, 0)
    assert got[2][3] == round(206.835 - 1.015 * 1.0 - 84.6 * 0.0, 4)
    # no sentence punctuation: sentence floor = 1
    assert got[3][1] == 0 and got[3][3] is not None
