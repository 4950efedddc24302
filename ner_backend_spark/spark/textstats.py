"""Text analysis operators: token counts, quality scores, language ID,
document fingerprints. All JVM-side (built-in functions, codegen-friendly)
except :func:`bpe_encode`, the exact merge-based BPE path, which is an
Arrow-batched kernel by necessity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "für", "nicht", "ein"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "una", "por"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
}


def token_count(text: Column) -> Column:
    """Whitespace-token count, matching Go strings.Fields / str.split():
    empty text -> 0 tokens (processor.go:640-641)."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def add_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens, n_chars, n_bytes, mean_token_len."""
    t = F.col(text_col)
    n_tokens = token_count(t)
    return df.withColumns(
        {
            "n_tokens": n_tokens,
            "n_chars": F.length(t),
            "n_bytes": F.octet_length(t),
            "mean_token_len": F.when(n_tokens > 0, (
                F.length(F.regexp_replace(t, r"\s+", "")) / n_tokens
            )).otherwise(F.lit(0.0)),
        }
    )


def add_quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality signals: punctuation ratio, digit ratio, uppercase
    ratio, stopword ratio (English), and a combined [0,1] quality score."""
    t = F.col(text_col)
    n_chars = F.greatest(F.length(t), F.lit(1))
    # Unicode-aware classes: Java's \w is ASCII-only, so [^\w\s] counted
    # every non-ASCII LETTER (ü, é, 東) as punctuation and collapsed
    # quality_score to ~0 for non-English prose (round-3 review finding).
    # \p{L}\p{N} works identically in Java regex (Spark) and RE2 (DuckDB).
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\p{L}\p{N}_\s]", ""))
    digits = F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))
    upper = F.length(t) - F.length(F.regexp_replace(t, r"\p{Lu}", ""))
    n_tokens = F.greatest(token_count(t), F.lit(1))
    sw = STOPWORDS["en"]
    sw_hits = F.size(
        F.filter(
            F.split(F.lower(F.trim(t)), r"\s+"),
            lambda w: w.isin(sw),
        )
    )
    df = df.withColumns(
        {
            "punct_ratio": punct / n_chars,
            "digit_ratio": digits / n_chars,
            "upper_ratio": upper / n_chars,
            "stopword_ratio": sw_hits / n_tokens,
        }
    )
    # simple monotone combination: long-enough, low punctuation/digit noise,
    # some stopwords (prose-likeness)
    return df.withColumn(
        "quality_score",
        F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(0.0),
                F.lit(1.0)
                - F.col("punct_ratio") * 2
                - F.col("digit_ratio") * 2
                + F.least(F.col("stopword_ratio") * 2, F.lit(0.3)),
            ),
        ),
    )


def add_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """lang_pred: argmax of per-language stopword hit counts ('und' if none).

    A character-n-gram model would be a drop-in replacement; the operator
    shape (tokenize once, score K literal word sets) is what matters.
    """
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    scores = [
        F.struct(
            F.size(F.filter(words, lambda w: w.isin(sw))).alias("hits"),
            # tie-break deterministically by language code (descending
            # array_max picks the first max; order langs alphabetically)
            F.lit(lang).alias("lang"),
        )
        for lang, sw in sorted(STOPWORDS.items())
    ]
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        "lang_pred",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


# GPT-2-style pretokenizer classes, lookahead-free so Java regex (Spark),
# RE2 (DuckDB) and PCRE agree: contractions, space-prefixed letter runs,
# digit runs, punctuation runs, residual whitespace.
BPE_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?\p{L}+"
    r"| ?\p{N}+"
    r"| ?[^\s\p{L}\p{N}]+"
    r"|\s+"
)


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: GPT-2 pretokenizer classes, pure-whitespace
    matches excluded. Stays in whole-stage codegen (regexp_extract_all +
    filter); the LLM-budget analogue of the whitespace token_count."""
    return F.size(
        F.filter(
            F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0)),
            lambda t: F.trim(t) != "",
        )
    )


def add_bpe_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_bpe_tokens", bpe_token_count(F.col(text_col)))


def bpe_encode(
    df: DataFrame, id_col: str, text_col: str, n_merges: int = 384
) -> DataFrame:
    """(id, n_bpe_tokens, ids_hash): REAL merge-based BPE encoding.

    Applies the trained byte-level vocabulary (core/bpe.py; fixture-corpus
    merges, deterministic everywhere) in an Arrow-batched kernel.
    ``ids_hash`` is md5 over the int64 token-id bytes — a hashable scalar
    that pins the full id sequence under the driver's value-hash gate.
    ``bpe_token_count`` remains the pure-codegen pretokenizer COUNT
    approximation; this is the exact-count + sequence path.
    """
    import hashlib
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..core.bpe import default_vocab

    vocab = default_vocab(n_merges)  # pickles as merges; ranks rebuilt per worker
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, n_bpe_tokens long, ids_hash string"

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            ns, hs = [], []
            for text in pdf[text_col].values:
                ids = np.asarray(vocab.encode(text or ""), dtype=np.int64)
                ns.append(len(ids))
                hs.append(hashlib.md5(ids.tobytes()).hexdigest())
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "n_bpe_tokens": ns, "ids_hash": hs}
            )

    from .session import ensure_parallelism

    narrow = ensure_parallelism(df.select(id_col, text_col))
    return narrow.mapInPandas(run, schema)


def add_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """fingerprint: md5 of whitespace-normalized lowercase text.

    Content-defined, collation-free, and portable (same value in DuckDB:
    md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))).
    """
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn("fingerprint", F.md5(normalized))
