"""Byte-level BPE: deterministic training, encoding, and offset-aligned
subword tokenization.

The reference tokenizes with the Qwen2.5-0.5B BPE vocabulary
(internal/core/onnx.go:205-217); that vocab is a model asset we can't ship,
so this module trains a small byte-level vocabulary with the same algorithm
family (Sennrich et al. 2016 merges over a GPT-2-style byte pretokenizer)
on the deterministic fixture corpus. Token budgets computed with it are
real merge-based BPE counts (vs the pretokenizer-regex *approximation* in
spark/textstats.bpe_token_count, which stays as the pure-codegen fast
path), and the CRF path tokenizes with it through
:class:`~ner_backend_spark.core.crf.BpeTokenizer`.

Everything here is a pure function of (corpus, n_merges): training uses
count-then-lexicographic tie-breaking, so any process — driver, executor,
oracle — derives the identical vocabulary.
"""

from __future__ import annotations

import re
from collections import Counter
from functools import lru_cache
from typing import Iterable

# Python-re rendering of the GPT-2 pretokenizer classes (textstats.
# BPE_PATTERN is the Java/RE2 rendering used by the codegen fast path):
# contractions, space-prefixed letter runs, digit runs, punct runs (incl.
# '_', which \w swallows), residual whitespace.
_PRETOKEN_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[^\W\d_]+"
    r"| ?\d+"
    r"| ?(?:[^\w\s]|_)+"
    r"|\s+"
)


def pretokenize(text: str) -> list[str]:
    """GPT-2-style pretokens; pure-whitespace matches dropped (they carry
    no BPE-mergeable content and the codegen count excludes them too)."""
    return [m for m in _PRETOKEN_RE.findall(text) if m.strip()]


def train_bpe(
    corpus: Iterable[str], n_merges: int = 384
) -> list[tuple[bytes, bytes]]:
    """Learn ``n_merges`` byte-pair merges from ``corpus``.

    Classic frequency-greedy training over the distinct-pretoken frequency
    table (never the raw corpus — cost scales with vocabulary, not corpus
    length). Deterministic: the best pair is (max count, lexicographically
    smallest) so ties can't depend on dict order.
    """
    counts: Counter[bytes] = Counter()
    for text in corpus:
        for pt in pretokenize(text):
            counts[pt.encode("utf-8")] += 1

    words: dict[bytes, list[bytes]] = {
        w: [w[i : i + 1] for i in range(len(w))] for w in counts
    }
    merges: list[tuple[bytes, bytes]] = []
    pair_counts: Counter[tuple[bytes, bytes]] = Counter()
    pair_words: dict[tuple[bytes, bytes], set[bytes]] = {}
    for w, syms in words.items():
        c = counts[w]
        for pair in zip(syms, syms[1:]):
            pair_counts[pair] += c
            pair_words.setdefault(pair, set()).add(w)

    for _ in range(n_merges):
        if not pair_counts:
            break
        (a, b), best_count = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best_count < 2:
            break  # merges seen once generalize to nothing
        merges.append((a, b))
        merged = a + b
        # re-segment only the words containing the pair, updating the
        # affected pair counts incrementally
        for w in list(pair_words.get((a, b), ())):
            syms = words[w]
            c = counts[w]
            for pair in zip(syms, syms[1:]):
                pair_counts[pair] -= c
                if pair_counts[pair] <= 0:
                    del pair_counts[pair]
                ws = pair_words.get(pair)
                if ws is not None:
                    ws.discard(w)
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
            for pair in zip(out, out[1:]):
                pair_counts[pair] += c
                pair_words.setdefault(pair, set()).add(w)
    return merges


class BpeVocab:
    """Frozen merge list + derived id table and encoder."""

    def __init__(self, merges: list[tuple[bytes, bytes]]):
        self.merges = merges
        self.ranks = {pair: r for r, pair in enumerate(merges)}
        # ids: 256 base bytes, then one id per merge product
        self.token_ids = {bytes([i]): i for i in range(256)}
        for a, b in merges:
            self.token_ids.setdefault(a + b, len(self.token_ids))
        self._encode_pretoken = lru_cache(maxsize=65536)(
            self._encode_pretoken_uncached
        )

    def __getstate__(self):  # lru_cache isn't picklable; rebuild on load
        return {"merges": self.merges}

    def __setstate__(self, state):
        self.__init__(state["merges"])

    @property
    def vocab_size(self) -> int:
        return len(self.token_ids)

    def _encode_pretoken_uncached(self, data: bytes) -> tuple[bytes, ...]:
        syms = [data[i : i + 1] for i in range(len(data))]
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i, pair in enumerate(zip(syms, syms[1:])):
                r = self.ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return tuple(syms)

    def encode(self, text: str) -> list[int]:
        """Token ids for ``text`` (pretokenize -> merge -> id lookup)."""
        ids: list[int] = []
        for pt in pretokenize(text):
            for sym in self._encode_pretoken(pt.encode("utf-8")):
                ids.append(self.token_ids[sym])
        return ids

    def encode_bytes_with_offsets(
        self, data: bytes
    ) -> list[tuple[int, int, int]]:
        """(token_id, byte_start, byte_end) over UTF-8 ``data``.

        Same symbol sequence as :meth:`encode` (GPT-2 semantics: a leading
        space is part of the token, and of its span — get_word_ids maps
        such a token to the word it overlaps, never the space gap).
        Undecodable input falls back to latin-1 (byte-transparent), keeping
        offsets valid for arbitrary bytes.
        """
        try:
            text = data.decode("utf-8")
            enc = "utf-8"
        except UnicodeDecodeError:
            text = data.decode("latin-1")
            enc = "latin-1"  # byte-transparent: 1 char == 1 source byte
        # prefix byte lengths in the SOURCE encoding: char idx -> byte offset
        # (mixing latin-1 decode with utf-8 lengths would drift every span
        # after the first non-ASCII byte and overrun the input)
        byte_off = [0]
        for ch in text:
            byte_off.append(byte_off[-1] + len(ch.encode(enc)))
        out: list[tuple[int, int, int]] = []
        for m in _PRETOKEN_RE.finditer(text):
            pt = m.group(0)
            if not pt.strip():
                continue
            pos = byte_off[m.start()]
            for sym in self._encode_pretoken(pt.encode(enc)):
                out.append((self.token_ids[sym], pos, pos + len(sym)))
                pos += len(sym)
        return out


def _fixture_corpus() -> list[str]:
    from .. import fixtures

    return [r[3] for r in fixtures.generate_rows(n=200)]


@lru_cache(maxsize=4)
def default_vocab(n_merges: int = 384) -> BpeVocab:
    """The shipped vocabulary: trained on the deterministic fixture corpus.
    Cached per process; ~deciseconds to derive, identical everywhere."""
    return BpeVocab(train_bpe(_fixture_corpus(), n_merges))
