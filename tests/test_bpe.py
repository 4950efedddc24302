"""Real merge-based BPE: training determinism, encode/offset contracts,
and the Spark kernel vs single-threaded parity.

Reference context: the reference tokenizes with the Qwen2.5-0.5B BPE
(internal/core/onnx.go:205-217); this repo trains a small byte-level vocab
with the same algorithm family so token budgets are real merge counts.
"""

import numpy as np
import pytest

from ner_backend_spark.core.bpe import (
    BpeVocab,
    default_vocab,
    pretokenize,
    train_bpe,
)


def test_training_is_deterministic():
    corpus = ["the cat sat on the mat", "the cat ate the rat"] * 20
    m1 = train_bpe(corpus, n_merges=50)
    m2 = train_bpe(corpus, n_merges=50)
    assert m1 == m2
    assert len(m1) > 0
    # the most frequent pair in this corpus involves 'the'/' the' bytes
    assert all(isinstance(a, bytes) and isinstance(b, bytes) for a, b in m1)


def test_default_vocab_stable_across_calls():
    v1, v2 = default_vocab(), default_vocab()
    assert v1.merges == v2.merges
    assert v1.vocab_size == 256 + len(v1.merges)


def test_merges_reduce_token_count():
    """Real merges must beat the per-byte baseline on in-domain text."""
    v = default_vocab()
    text = "The committee approved the proposal after a lengthy debate."
    ids = v.encode(text)
    n_bytes = sum(len(pt.encode()) for pt in pretokenize(text))
    assert len(ids) < n_bytes * 0.6  # substantial compression
    assert all(0 <= i < v.vocab_size for i in ids)


def test_encode_offsets_agree_with_encode():
    v = default_vocab()
    for text in [
        "Contact alice.smith@example.com for details.",
        "Zoë Faulkner 🌟 | SSN: 123-45-6789",
        "",
        "   ",
        "a",
    ]:
        data = text.encode("utf-8")
        toks = v.encode_bytes_with_offsets(data)
        assert [t[0] for t in toks] == v.encode(text)
        # offsets sorted, non-overlapping, within bounds (get_word_ids
        # contract), and each span re-encodes to its own symbol bytes
        last = 0
        for _tid, s, e in toks:
            assert 0 <= s < e <= len(data)
            assert s >= last
            last = e


def test_unseen_bytes_fall_back_to_byte_tokens():
    v = BpeVocab(train_bpe(["aa bb aa bb aa bb"], n_merges=10))
    ids = v.encode("zzz \x07")
    assert len(ids) > 0  # every byte has an id; nothing is OOV


def test_vocab_pickles_compactly():
    import pickle

    v = default_vocab()
    v2 = pickle.loads(pickle.dumps(v))
    assert v2.merges == v.merges
    assert v2.encode("the committee") == v.encode("the committee")


def test_spark_kernel_matches_single_threaded(spark):
    from ner_backend_spark.spark.textstats import bpe_encode

    import hashlib

    rows = [(i, t) for i, t in enumerate([
        "The committee approved the proposal after a lengthy debate.",
        "Contact us at alice.smith@example.com for details.",
        "",
        "Rainfall totals exceeded seasonal averages across the region.",
    ])]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_bpe_tokens"], r["ids_hash"])
           for r in bpe_encode(df, "doc_id", "text").collect()}
    v = default_vocab()
    for i, t in rows:
        ids = np.asarray(v.encode(t), dtype=np.int64)
        assert got[i] == (len(ids), hashlib.md5(ids.tobytes()).hexdigest())


def test_non_utf8_bytes_get_valid_offsets():
    """latin-1 fallback must keep offsets in SOURCE bytes: no span may
    drift past the data after a non-UTF-8 byte (review round-3 finding)."""
    v = default_vocab()
    data = b"caf\xe9 bar"
    toks = v.encode_bytes_with_offsets(data)
    assert toks
    last = 0
    for _tid, s, e in toks:
        assert 0 <= s < e <= len(data)
        assert s >= last
        last = e
    # the reassembled non-space bytes cover the input's tokens faithfully
    assert b"".join(data[s:e] for _t, s, e in toks).replace(b" ", b"") == data.replace(b" ", b"")
