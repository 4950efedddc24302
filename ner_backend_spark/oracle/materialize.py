"""Materialize the pure-Python oracles as parquet tables for the driver gate.

The driver compares each Spark query against ``oracle_sql()`` run in DuckDB.
For queries that aren't SQL-expressible (the NER pipeline with offsets and
contexts, LSH/ANN, the KG build), the oracle SQL is simply
``SELECT ... FROM read_parquet('<oracles>/<query>.parquet')`` over tables
produced here by the single-threaded pure-Python implementations in
pyoracle.py (VERDICT r1 "Next round" #1).

Regeneration is lazy and versioned: ``ensure_oracles`` rebuilds only when
the version stamp (ORACLE_VERSION + sf_dir) is missing or stale, so calling
it from ``oracle_sql()`` is cheap after the first run. Bump ORACLE_VERSION
whenever oracle-relevant semantics change.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

ORACLE_VERSION = "19"

_S = pa.string()
_L = pa.int64()
_D = pa.float64()

_ENTITY_SCHEMA = pa.schema(
    [
        ("url", _S),
        ("label", _S),
        ("text", _S),
        ("start", _L),
        ("end", _L),
        ("l_context", _S),
        ("r_context", _S),
    ]
)

# query name -> (pyoracle function name, pyarrow schema)
TABLES: dict[str, tuple[str, pa.Schema]] = {
    "q_ner_pipeline": ("oracle_ner_pipeline", _ENTITY_SCHEMA),
    "q_crf_pipeline": ("oracle_crf_pipeline", _ENTITY_SCHEMA),
    "q_merged_model": ("oracle_merged_model", _ENTITY_SCHEMA),
    "q_presidio_pages": ("oracle_presidio_pages", _ENTITY_SCHEMA),
    "q_previews": (
        "oracle_previews",
        pa.schema([("url", _S), ("n_tokens", _L), ("n_tags", _L)]),
    ),
    "q_redaction": (
        "oracle_redaction",
        pa.schema([("url", _S), ("redacted", _S), ("n_redactions", _L)]),
    ),
    "q_multimodal_features": (
        "oracle_multimodal",
        pa.schema([("url", _S), ("n_bytes", _L), ("feat_hash", _S)]),
    ),
    "q_minhash_neardups": (
        "oracle_minhash_neardups",
        pa.schema([("id_a", _L), ("id_b", _L), ("est_jaccard", _D)]),
    ),
    "q_simhash_neardups": (
        "oracle_simhash_neardups",
        pa.schema([("id_a", _L), ("id_b", _L), ("hamming", _L)]),
    ),
    "q_lsh_ann": (
        "oracle_lsh_ann",
        pa.schema([("query_id", _L), ("neighbor_id", _L), ("rnk", _L)]),
    ),
    "q_ivf_ann": (
        "oracle_ivf_ann",
        pa.schema([("query_id", _L), ("neighbor_id", _L), ("rnk", _L)]),
    ),
    "q_embedding_neardup_lsh": (
        "oracle_embedding_neardup_lsh",
        pa.schema([("id_a", _L), ("id_b", _L)]),
    ),
    "q_kg_triples": (
        "oracle_kg_triples",
        pa.schema([("subj", _S), ("pred", _S), ("obj", _S)]),
    ),
    "q_kg_components": (
        "oracle_kg_components",
        pa.schema([("id", _L), ("component", _L)]),
    ),
    "q_kg_kcore": (
        "oracle_kg_kcore",
        pa.schema([("node", _S), ("deg", _L)]),
    ),
    "q_stratified_sample": (
        "oracle_stratified_sample",
        pa.schema([("doc_id", _L), ("lang", _S)]),
    ),
    "q_winnow_fingerprints": (
        "oracle_winnow_fingerprints",
        pa.schema([("doc_id", _L), ("fp", _L)]),
    ),
    "q_winnow_neardups": (
        "oracle_winnow_neardups",
        pa.schema([("id_a", _L), ("id_b", _L), ("n_shared", _L)]),
    ),
    "q_bpe_encode": (
        "oracle_bpe_encode",
        pa.schema([("doc_id", _L), ("n_bpe_tokens", _L), ("ids_hash", _S)]),
    ),
    "q_pii_density": (
        "oracle_pii_density",
        pa.schema(
            [
                ("url", _S),
                ("total_tokens", _L),
                ("n_entities", _L),
                ("pii_density", _D),
            ]
        ),
    ),
    "q_audio_features": (
        "oracle_audio_features",
        pa.schema(
            [
                ("url", _S),
                ("n_bytes", _L),
                ("sample_rate", _L),
                ("n_samples", _L),
                ("duration_ms", _L),
                ("decoded", _S),
                ("rms_0", _D),
                ("rms_1", _D),
                ("rms_2", _D),
                ("rms_3", _D),
            ]
        ),
    ),
    "q_compression_ratio": (
        "oracle_compression_ratio",
        pa.schema(
            [
                ("doc_id", _L),
                ("n_bytes", _L),
                ("n_compressed", _L),
                ("compression_ratio", _D),
            ]
        ),
    ),
    "q_kmeans_assign": (
        "oracle_kmeans_assign",
        pa.schema([("id", _L), ("centroid_id", _L)]),
    ),
    "q_semantic_dedup": (
        "oracle_semantic_dedup",
        pa.schema([("id", _L), ("cid", _L), ("is_dup", pa.bool_())]),
    ),
    "q_pq_ann": (
        "oracle_pq_ann",
        pa.schema([("query_id", _L), ("neighbor_id", _L), ("rnk", _L)]),
    ),
    "q_kg_truss": (
        "oracle_kg_truss",
        pa.schema([("node_a", _S), ("node_b", _S), ("support", _L)]),
    ),
    "q_dup_clusters": (
        "oracle_dup_clusters",
        pa.schema(
            [
                ("doc_id", _L),
                ("cluster_id", _L),
                ("cluster_size", _L),
                ("is_kept", pa.bool_()),
            ]
        ),
    ),
    "q_task_rollup": (
        "oracle_task_rollup",
        pa.schema(
            [
                ("partition_id", _L),
                ("status", _S),
                ("n_attempts", _L),
                ("n_docs", _L),
                ("n_entities", _L),
                ("n_tokens", _L),
            ]
        ),
    ),
}


def default_oracle_dir(sf_dir: str) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo, "oracles", os.path.basename(sf_dir.rstrip("/")))


def _write(rows: list[tuple], schema: pa.Schema, path: str) -> None:
    cols = list(zip(*rows)) if rows else [[] for _ in schema]
    table = pa.table(
        {f.name: pa.array(list(c), type=f.type) for f, c in zip(schema, cols)},
        schema=schema,
    )
    pq.write_table(table, path)


def generate(sf_dir: str, out_dir: str, only: list[str] | None = None) -> None:
    from . import pyoracle

    os.makedirs(out_dir, exist_ok=True)
    for name, (fn_name, schema) in TABLES.items():
        if only and name not in only:
            continue
        rows = getattr(pyoracle, fn_name)(sf_dir)
        _write(rows, schema, os.path.join(out_dir, f"{name}.parquet"))


def _stamp(sf_dir: str) -> str:
    return f"{ORACLE_VERSION}:{os.path.abspath(sf_dir)}"


def ensure_oracles(
    sf_dir: str = "/root/testdata/sf0.01", out_dir: str | None = None
) -> str:
    """Generate the oracle tables if missing/stale; return their directory."""
    out_dir = out_dir or default_oracle_dir(sf_dir)
    stamp_path = os.path.join(out_dir, "_VERSION")
    try:
        with open(stamp_path) as f:
            if f.read().strip() == _stamp(sf_dir) and all(
                os.path.exists(os.path.join(out_dir, f"{n}.parquet"))
                for n in TABLES
            ):
                return out_dir
    except FileNotFoundError:
        pass
    generate(sf_dir, out_dir)
    with open(stamp_path, "w") as f:
        f.write(_stamp(sf_dir))
    return out_dir
