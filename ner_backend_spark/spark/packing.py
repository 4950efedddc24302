"""Sequence packing for LLM training-data assembly.

The last step of a curation pipeline before tokenized training shards:
lay the surviving documents end-to-end in a deterministic order and
split the concatenation into fixed-length training sequences (the
GPT-style "concatenate and chunk" packing). The interesting part at
100 TB is the prefix sum: the naive formulation is ONE global window
(``sum(n_tok) over (order by id)``) whose physical plan is a
single-partition sort — a driver-sized bottleneck. This module computes
the identical arithmetic as a two-level distributed prefix sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tok_col: str,
    seq_len: int,
    chunk: int = 4096,
) -> DataFrame:
    """(id, n_tok, start_off, seq_id): concatenate-and-split packing.

    Documents are laid end-to-end in ascending ``id_col`` order;
    ``start_off`` is each document's first-token offset in that global
    concatenation and ``seq_id = start_off // seq_len`` is the training
    sequence its first token falls in.

    Distributed prefix sum, no global window: rows are range-chunked by
    ``floor(id / chunk)`` — order-preserving across chunks because ids
    sort identically within and between chunks — then

    1. intra-chunk running sums via a window PARTITIONED on the chunk id
       (one hash exchange, parallel across chunks);
    2. per-chunk totals (map-side-combined groupBy, one row per chunk);
    3. exclusive prefix offsets over the totals via a window over chunk
       ids — global, but over CHUNK-COUNT rows (at 10^12 docs and
       chunk=10^6 that is 10^6 rows, still executor-sized; recurse the
       same construction if it ever isn't);
    4. broadcast the offsets back onto the chunked rows.

    The DuckDB oracle is the naive single global window — identical
    arithmetic, different physical plan, which is the point.
    """
    base = df.select(
        F.col(id_col),
        F.col(tok_col).cast("long").alias(tok_col),
        F.floor(F.col(id_col) / chunk).alias("_chunk"),
    )
    # explicit ROWS frame: orderBy alone defaults to RANGE, which sums
    # duplicate ids together and would desync from the oracle's ROWS
    # frame if ids ever repeated (round-7 ADVICE; ids are unique in
    # every current caller, this pins the semantics rather than the data)
    w = (
        Window.partitionBy("_chunk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("_cum", F.sum(tok_col).over(w))
    totals = base.groupBy("_chunk").agg(F.sum(tok_col).alias("_tot"))
    wprefix = (
        Window.orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = totals.select(
        "_chunk",
        F.coalesce(F.sum("_tot").over(wprefix), F.lit(0)).alias("_off"),
    )
    start = F.col("_cum") - F.col(tok_col) + F.col("_off")
    return (
        local.join(F.broadcast(prefixes), "_chunk")
        .select(
            id_col,
            F.col(tok_col).alias("n_tok"),
            start.alias("start_off"),
            F.floor(start / seq_len).cast("long").alias("seq_id"),
        )
    )
