"""Property-based tests (hypothesis) for the core invariant layer.

These pin the CONTRACTS the distributed kernels rely on — length
preservation, span validity, fingerprint guarantees — over generated
inputs, complementing the golden tests ported from the reference
(SURVEY §5's table-driven strategy, extended with fuzzing).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ner_backend_spark.core.bpe import default_vocab
from ner_backend_spark.core.crf import CRF, get_word_ids
from ner_backend_spark.core.entity import Entity
from ner_backend_spark.core.inference import coalesce_entities
from ner_backend_spark.core.preprocess import (
    clean_text_with_spans,
    split_text_custom_length,
)
from ner_backend_spark.spark.dedup import _winnow_fps_py, simhash_blocking

# text strategies: printable-ish plus whitespace and unicode
_texts = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=400,
)
_ascii_words = st.lists(
    st.text(alphabet="abcdefgh123.-@", min_size=1, max_size=12),
    min_size=0,
    max_size=60,
)


@given(_texts)
@settings(max_examples=200, deadline=None)
def test_clean_text_span_contract(text):
    """Cleaned spans are sorted/non-overlapping, parallel to original
    spans, and every cleaned token's bytes come verbatim from the blanked
    original at the recorded offsets (preprocess.go:9-60 semantics)."""
    data = text.encode("utf-8")
    cleaned, orig_spans, clean_spans = clean_text_with_spans(data)
    assert len(orig_spans) == len(clean_spans)
    last = 0
    for (os_, oe), (cs, ce) in zip(orig_spans, clean_spans):
        assert 0 <= os_ < oe <= len(data)
        assert 0 < cs < ce <= len(cleaned)
        assert cs >= last
        last = ce
        tok = cleaned[cs:ce]
        assert b" " not in tok and tok  # tokens are \S+ runs
    # cleaned text is " token token ..." exactly
    rebuilt = b"".join(b" " + cleaned[cs:ce] for cs, ce in clean_spans)
    assert rebuilt == cleaned


@given(_texts, st.integers(min_value=1, max_value=7))
@settings(max_examples=100, deadline=None)
def test_split_covers_all_tokens(text, length):
    data = text.encode("utf-8")
    cleaned, _orig, clean_spans = clean_text_with_spans(data)
    sentences, offsets = split_text_custom_length(cleaned, length)
    # every token of the cleaned text lands inside exactly one sentence
    covered = 0
    for sent, off in zip(sentences, offsets):
        toks = sent.split()
        covered += len(toks)
    assert covered == len(clean_spans)


@given(_texts)
@settings(max_examples=200, deadline=None)
def test_bpe_offsets_contract(text):
    """Offset tokens reproduce encode()'s ids with sorted in-bounds spans
    whose bytes concatenate to the pretokens' own bytes."""
    v = default_vocab()
    data = text.encode("utf-8")
    toks = v.encode_bytes_with_offsets(data)
    assert [t[0] for t in toks] == v.encode(text)
    last = 0
    for _tid, s, e in toks:
        assert 0 <= s < e <= len(data)
        assert s >= last
        last = e


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),
            st.integers(min_value=0, max_value=60),
            st.integers(min_value=1, max_value=8),
        ),
        max_size=12,
    )
)
@settings(max_examples=200, deadline=None)
def test_coalesce_output_sorted_and_merge_closed(spec):
    """Coalesced entities are start-sorted and contain no same-label
    adjacent pair within the merge gap (the operation is closed)."""
    by_label: dict[str, list[Entity]] = {}
    for label, start, width in spec:
        e = Entity(
            label=label,
            text="x" * width,
            start=start,
            end=start + width,
            l_context="",
            r_context="y" * 20,
        )
        by_label.setdefault(label, []).append(e)
    out = coalesce_entities(by_label)
    for a, b in zip(out, out[1:]):
        assert a.start <= b.start
        if a.label == b.label:
            gap = b.start - a.end
            assert not (0 <= gap <= 1), "mergeable pair survived coalesce"


@given(_ascii_words, _ascii_words, st.integers(min_value=0, max_value=40))
@settings(max_examples=100, deadline=None)
def test_winnowing_shared_substring_guarantee(wa, wb, pos):
    """Schleimer et al.: two texts sharing a substring of length >=
    k + window - 1 share at least one winnowing fingerprint."""
    k, window = 5, 4
    shared = "qqqqqqqqzz"  # len 10 >= k + window - 1 = 8
    ta = " ".join(wa[:pos] + [shared] + wa[pos:])
    tb = " ".join(wb) + " " + shared
    fa = set(_winnow_fps_py(ta, k, window).tolist())
    fb = set(_winnow_fps_py(tb, k, window).tolist())
    assert fa & fb


@given(
    st.integers(min_value=0, max_value=63).flatmap(
        lambda r: st.tuples(
            st.just(min(r, 10)),
            st.integers(min_value=0, max_value=(1 << 63) - 1),
            st.lists(
                st.integers(min_value=0, max_value=63),
                max_size=10,
                unique=True,
            ),
        )
    )
)
@settings(max_examples=200, deadline=None)
def test_simhash_blocking_pigeonhole_property(args):
    radius, a, flips = args
    b = a
    for bit in flips[:radius]:
        b ^= 1 << bit
    tables = simhash_blocking(radius)
    shared = any(
        all((a >> off) & ((1 << w) - 1) == (b >> off) & ((1 << w) - 1)
            for off, w in blocks)
        for blocks in tables
    )
    assert shared


@given(
    st.lists(st.integers(min_value=1, max_value=5), min_size=0, max_size=20),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=200, deadline=None)
def test_get_word_ids_maps_every_token_to_overlapping_word(widths, sub):
    """Tokens map to the word they overlap, or -1 in gaps — for arbitrary
    word layouts and subword granularities."""
    words = []
    pos = 0
    for w in widths:
        words.append((pos, pos + w))
        pos += w + 1  # single-byte gap
    tokens = []
    for s, e in words:
        for t0 in range(s, e, sub):
            tokens.append((t0, min(t0 + sub, e)))
    ids = get_word_ids(words, tokens)
    for (ts, te), wid in zip(tokens, ids):
        assert wid >= 0
        ws, we = words[wid]
        assert ts < we and ws < te  # genuine overlap


@given(st.data())
@settings(max_examples=50, deadline=None)
def test_viterbi_batch_equals_sequential_property(data):
    t = data.draw(st.integers(min_value=2, max_value=8))
    rng = np.random.RandomState(data.draw(st.integers(0, 1000)))
    crf = CRF(
        transitions=rng.randint(-2, 3, size=(t, t)).astype(np.float32),
        start_probs=rng.randint(-2, 3, size=t).astype(np.float32),
        end_probs=rng.randint(-2, 3, size=t).astype(np.float32),
    )
    n_seqs = data.draw(st.integers(min_value=1, max_value=10))
    ems = [
        rng.randint(-3, 4, size=(rng.randint(1, 25), t)).astype(np.float32)
        for _ in range(n_seqs)
    ]
    assert crf.viterbi_decode_batch(ems, chunk=4) == [
        crf.viterbi_decode(e) for e in ems
    ]


@given(st.integers(0, 10**6))
@settings(max_examples=50, deadline=None)
def test_pq_encode_is_l2_argmin(seed):
    """The dot-minus-half-norm argmax form used by pq_encode/_pq_encode_np
    must select a codeword whose L2 distance equals the true per-block
    minimum (the two forms are algebraically identical; FP can reorder
    exact ties only, which cannot change the distance achieved)."""
    from ner_backend_spark.spark.similarity import _pq_encode_np, _pq_train

    rng = np.random.RandomState(seed)
    X = rng.normal(size=(40, 16))
    books = _pq_train(X, n_blocks=4, n_codes=8, iters=3)
    biases = 0.5 * (books**2).sum(axis=2)
    for _ in range(5):
        x = rng.normal(size=16)
        codes = _pq_encode_np(x, books, biases)
        for b in range(4):
            sub = x[b * 4:(b + 1) * 4]
            d2 = ((books[b] - sub) ** 2).sum(axis=1)
            assert 0 <= codes[b] < 8
            assert d2[codes[b]] <= d2.min() + 1e-9


@given(st.integers(0, 10**6), st.integers(3, 5))
@settings(max_examples=50, deadline=None)
def test_truss_inside_k_minus_1_core(seed, k):
    """Graph-theory containment the peel implementations must respect:
    every node of the k-truss lies in the (k-1)-core (each endpoint of a
    truss edge has >= k-2 common neighbors on that edge, hence degree
    >= k-1). Checked on the pure-Python reference peels the Spark ops
    are equivalence-tested against."""
    import random

    from tests.test_graph_asof import _py_truss

    rng = random.Random(seed)
    raw = {(rng.randrange(25), rng.randrange(25)) for _ in range(90)}
    und = {(min(a, b), max(a, b)) for a, b in raw if a != b}

    es = set(und)
    while True:  # (k-1)-core node peel
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k - 1}
        nxt = {(a, b) for a, b in es if a in keep and b in keep}
        if nxt == es:
            break
        es = nxt
    core_nodes = {n for e in es for n in e}

    truss_nodes = {n for e in _py_truss(und, k) for n in e}
    assert truss_nodes <= core_nodes
