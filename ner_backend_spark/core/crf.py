"""CNN+CRF tagger path: tokenize -> emissions -> Viterbi -> word spans.

Reference semantics: internal/core/onnx.go —
* ``idx2tag`` 19-tag vocabulary in fixed index order (onnx.go:33-38),
* Viterbi max-sum decode with start/end potentials (onnx.go:62-108),
* subword->word alignment (``getWordIds``, onnx.go:110-130),
* first-non-O-wins aggregation (``aggregatePredictions``, onnx.go:132-145),
* per-sentence batching of 100 whitespace tokens (text_utils.go:11-30) and
  cleaning via CleanTextWithSpans before tokenization (onnx.go:237-303).

The reference's production CNN weights are AES-encrypted and not shippable
(onnx.go:155-196); we substitute a deterministic hash-feature emission model
(``HashEmissionModel``) so the *operator shape* — batched emissions ->
Viterbi -> span reconstruction — is real and testable end-to-end. A trained
ONNX/torch model drops in by implementing ``emissions(tokens) -> [L,T]``.

All numpy; vectorized over sentences inside the pandas-UDF batch loop.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

from .entity import Entity, create_entity
from .preprocess import clean_text_with_spans, split_text_custom_length

# onnx.go:33-38
IDX2TAG = [
    "ADDRESS", "CARD_NUMBER", "COMPANY", "CREDIT_SCORE", "DATE",
    "EMAIL", "ETHNICITY", "GENDER", "ID_NUMBER", "LICENSE_PLATE",
    "LOCATION", "NAME", "O", "PHONENUMBER", "SERVICE_CODE",
    "SEXUAL_ORIENTATION", "SSN", "URL", "VIN",
]
O_INDEX = IDX2TAG.index("O")


@dataclass
class CRF:
    transitions: np.ndarray  # [T, T]
    start_probs: np.ndarray  # [T]
    end_probs: np.ndarray  # [T]

    @property
    def num_tags(self) -> int:
        return len(self.transitions)

    def viterbi_decode(self, emissions: np.ndarray) -> list[int]:
        """Max-sum decode (onnx.go:62-108), vectorized over tags."""
        seq_len = len(emissions)
        if seq_len == 0:
            return []
        n = self.num_tags
        dp = np.empty((seq_len, n), dtype=np.float32)
        bp = np.zeros((seq_len, n), dtype=np.int64)
        dp[0] = emissions[0] + self.start_probs
        cols = np.arange(n)
        for t in range(1, seq_len):
            # scores[prev, curr] = dp[t-1, prev] + transitions[prev, curr];
            # one argmax + gather instead of argmax + max (same result)
            scores = dp[t - 1][:, None] + self.transitions
            am = scores.argmax(axis=0)
            bp[t] = am
            dp[t] = scores[am, cols] + emissions[t]
        dp[-1] += self.end_probs
        seq = [0] * seq_len
        seq[-1] = int(dp[-1].argmax())
        for t in range(seq_len - 1, 0, -1):
            seq[t - 1] = int(bp[t][seq[t]])
        return seq

    def viterbi_decode_batch(
        self, emissions_list: list[np.ndarray], chunk: int = 512
    ) -> list[list[int]]:
        """Decode many sequences at once: pad to the chunk's max length and
        run the time loop over [B, T, T] tensors — B times fewer numpy
        dispatches than per-sequence decoding, bit-identical paths (same
        op order and first-index argmax tie-breaking; pinned in tests).
        ``chunk`` bounds the padded workspace (B*L*T floats). Sequences are
        decoded in length order so each chunk pads to its own max length
        (unsorted chunks waste ~2x on the typical length spread), then
        results return in input order."""
        order = sorted(range(len(emissions_list)), key=lambda i: len(emissions_list[i]))
        out: list[list[int]] = [[] for _ in emissions_list]
        for lo in range(0, len(order), chunk):
            idxs = order[lo : lo + chunk]
            for i, path in zip(
                idxs, self._decode_chunk([emissions_list[i] for i in idxs])
            ):
                out[i] = path
        return out

    def _decode_chunk(self, ems: list[np.ndarray]) -> list[list[int]]:
        n = self.num_tags
        b_size = len(ems)
        if b_size == 0:
            return []
        lens = [len(e) for e in ems]
        max_len = max(lens)
        if max_len == 0:
            return [[] for _ in ems]
        E = np.zeros((b_size, max_len, n), dtype=np.float32)
        for b, e in enumerate(ems):
            if len(e):
                E[b, : len(e)] = e
        dp_hist = np.empty((b_size, max_len, n), dtype=np.float32)
        bp = np.zeros((b_size, max_len, n), dtype=np.int32)
        dp = E[:, 0] + self.start_probs
        dp_hist[:, 0] = dp
        trans = self.transitions[None]
        for t in range(1, max_len):
            scores = dp[:, :, None] + trans  # [B, prev, curr]
            am = scores.argmax(axis=1)
            best = np.take_along_axis(scores, am[:, None, :], axis=1)[:, 0]
            dp = best + E[:, t]
            bp[:, t] = am
            dp_hist[:, t] = dp
        out: list[list[int]] = []
        for b, sl in enumerate(lens):
            if sl == 0:
                out.append([])
                continue
            final = dp_hist[b, sl - 1] + self.end_probs
            seq = [0] * sl
            seq[-1] = int(final.argmax())
            for t in range(sl - 1, 0, -1):
                seq[t - 1] = int(bp[b, t][seq[t]])
            out.append(seq)
        return out


def get_word_ids(
    word_offsets: list[tuple[int, int]],
    token_offsets: list[tuple[int, int]],
) -> list[int]:
    """Subword-token -> word alignment (onnx.go:110-130).

    Assumes both offset lists are sorted and non-overlapping; a token maps
    to the word it overlaps, else -1.
    """
    word_ids = [0] * len(token_offsets)
    word_id = 0
    for i, (tok_start, tok_end) in enumerate(token_offsets):
        while word_id < len(word_offsets) and word_offsets[word_id][1] <= tok_start:
            word_id += 1
        if word_id < len(word_offsets) and word_offsets[word_id][0] < tok_end:
            word_ids[i] = word_id
        else:
            word_ids[i] = -1
    return word_ids


def aggregate_predictions(
    tags: list[str], word_ids: list[int], num_words: int
) -> list[str]:
    """First non-O subword tag wins per word (onnx.go:132-145)."""
    preds = ["O"] * num_words
    for tag, word_id in zip(tags, word_ids):
        if word_id >= 0 and preds[word_id] == "O":
            preds[word_id] = tag
    return preds


class WhitespaceSubwordTokenizer:
    """Deterministic stand-in for the BPE tokenizer: splits each cleaned
    whitespace token into <=4-byte subword pieces with offsets. Preserves
    the alignment contract (sorted, non-overlapping offsets) that
    get_word_ids requires."""

    def tokenize_with_offsets(self, text: bytes) -> list[tuple[int, int]]:
        offsets: list[tuple[int, int]] = []
        i = 0
        n = len(text)
        while i < n:
            if text[i : i + 1].isspace():
                i += 1
                continue
            j = i
            while j < n and not text[j : j + 1].isspace():
                j += 1
            for k in range(i, j, 4):
                offsets.append((k, min(k + 4, j)))
            i = j
        return offsets


class BpeTokenizer:
    """Trained byte-level BPE subword tokenizer (core/bpe.py), offset-
    aligned: the real-subword analogue of the reference's Qwen BPE
    (onnx.go:205-217). Satisfies the sorted/non-overlapping offsets
    contract get_word_ids requires."""

    def __init__(self, vocab=None):
        if vocab is None:
            from .bpe import default_vocab

            vocab = default_vocab()
        self.vocab = vocab

    def tokenize_with_offsets(self, text: bytes) -> list[tuple[int, int]]:
        return [
            (s, e) for _, s, e in self.vocab.encode_bytes_with_offsets(text)
        ]


class HashEmissionModel:
    """Deterministic emissions: tag logits from a salted hash of the token
    bytes. Stands in for the CNN (weights not shippable; see module doc)."""

    def __init__(self, num_tags: int = len(IDX2TAG), bias_o: float = 2.0):
        self.num_tags = num_tags
        self.bias_o = bias_o

    def emissions(self, text: bytes, token_offsets) -> np.ndarray:
        out = np.zeros((len(token_offsets), self.num_tags), dtype=np.float32)
        for i, (s, e) in enumerate(token_offsets):
            digest = hashlib.blake2b(text[s:e], digest_size=8).digest()
            vals = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
            out[i, : min(8, self.num_tags)] = vals[: self.num_tags] / 255.0
            out[i, O_INDEX] += self.bias_o
        return out


class CnnCrfModel:
    """Batched sentence-level tagger with the OnnxModel's control flow
    (onnx.go:237-303): clean -> split(100) -> tokenize -> emissions ->
    viterbi -> word aggregation -> original-offset spans."""

    def __init__(self, crf: CRF, emission_model=None, tokenizer=None):
        self.crf = crf
        self.emission_model = emission_model or HashEmissionModel(crf.num_tags)
        self.tokenizer = tokenizer or WhitespaceSubwordTokenizer()

    @staticmethod
    def from_params(params: dict) -> "CnnCrfModel":
        if params.get("emissions") == "trained":
            # learned path (SURVEY §7.3(5)): softmax-trained hashed-feature
            # emissions + bigram-derived transitions from the committed
            # artifact, BPE subword tokenization
            from .crf_train import TrainedEmissionModel, load_artifact

            art = load_artifact()
            crf = CRF(
                transitions=art["transitions"],
                start_probs=art["start_probs"],
                end_probs=art["end_probs"],
            )
            return CnnCrfModel(
                crf,
                emission_model=TrainedEmissionModel(art["weights"]),
                tokenizer=BpeTokenizer(),
            )
        t = np.asarray(params["transitions"], dtype=np.float32)
        crf = CRF(
            transitions=t,
            start_probs=np.asarray(params["start_probs"], dtype=np.float32),
            end_probs=np.asarray(params["end_probs"], dtype=np.float32),
        )
        return CnnCrfModel(crf)

    def get_tags(self) -> list[str]:
        """Model vocabulary (minus O) — lets _compiled_state default the
        report's tag selection to the full vocabulary when a config omits
        tags, like PresidioModel. Without this, a tag-less cnn_crf config
        silently filtered every prediction out."""
        return [t for t in IDX2TAG if t != "O"]

    def _prepare(self, text: bytes):
        """clean + split + tokenize: (clean_to_orig, [(sent, sent_off,
        word_offsets, token_offsets), ...]) — the pre-Viterbi phase."""
        cleaned, orig_spans, clean_spans = clean_text_with_spans(text)
        sentences, sent_offsets = split_text_custom_length(cleaned, 100)
        clean_to_orig = dict(zip(clean_spans, orig_spans))
        infos = []
        for sent, sent_off in zip(sentences, sent_offsets):
            word_offsets = [
                (cs - sent_off, ce - sent_off)
                for cs, ce in clean_spans
                if cs >= sent_off and ce <= sent_off + len(sent)
            ]
            token_offsets = self.tokenizer.tokenize_with_offsets(sent)
            if not token_offsets:
                continue
            infos.append((sent, sent_off, word_offsets, token_offsets))
        return clean_to_orig, infos

    def _assemble(
        self, text: bytes, clean_to_orig, infos, paths
    ) -> list[Entity]:
        """Viterbi paths -> word tags -> original-offset entity spans."""
        entities: list[Entity] = []
        for (sent, sent_off, word_offsets, token_offsets), path in zip(
            infos, paths
        ):
            tags = [IDX2TAG[p] if p < len(IDX2TAG) else "O" for p in path]
            word_ids = get_word_ids(word_offsets, token_offsets)
            word_tags = aggregate_predictions(tags, word_ids, len(word_offsets))
            for (ws, we), tag in zip(word_offsets, word_tags):
                if tag == "O":
                    continue
                clean_span = (ws + sent_off, we + sent_off)
                orig = clean_to_orig.get(clean_span)
                if orig is None:
                    continue
                entities.append(create_entity(tag, text, orig[0], orig[1]))
        return entities

    def predict(self, text: bytes) -> list[Entity]:
        clean_to_orig, infos = self._prepare(text)
        paths = [
            self.crf.viterbi_decode(
                self.emission_model.emissions(sent, token_offsets)
            )
            for sent, _off, _wo, token_offsets in infos
        ]
        return self._assemble(text, clean_to_orig, infos, paths)

    def predict_batch(self, texts: list[bytes]) -> list[list[Entity]]:
        """Batch decode: all sentences of all documents go through ONE
        padded-tensor Viterbi pass (viterbi_decode_batch) instead of a
        numpy dispatch per time step per sentence. Bit-identical entities
        to per-document predict (pinned in tests) — the Arrow kernel calls
        this so the model sees whole batches, like the reference's 16-text
        gRPC batching (internal/core/python/model.go:176-215), but the
        single-doc path and the oracle keep the simple loop."""
        prepared = [self._prepare(t) for t in texts]
        ems = [
            self.emission_model.emissions(sent, token_offsets)
            for _c2o, infos in prepared
            for sent, _off, _wo, token_offsets in infos
        ]
        paths = self.crf.viterbi_decode_batch(ems)
        out: list[list[Entity]] = []
        pos = 0
        for text, (clean_to_orig, infos) in zip(texts, prepared):
            doc_paths = paths[pos : pos + len(infos)]
            pos += len(infos)
            out.append(self._assemble(text, clean_to_orig, infos, doc_paths))
        return out
