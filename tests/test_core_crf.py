"""CRF goldens ported from internal/core/onnx_test.go:10-131."""

import numpy as np

from ner_backend_spark.core.crf import (
    CRF,
    CnnCrfModel,
    aggregate_predictions,
    get_word_ids,
)

GOLDEN_CRF = CRF(
    transitions=np.array(
        [
            [0.8, 0.5, 0.2, 0.1],
            [0.2, 0.4, 0.1, 0.3],
            [0.3, 0.6, 0.9, 0.3],
            [0.9, 0.9, 0.9, 0.3],
        ],
        dtype=np.float32,
    ),
    start_probs=np.array([0.7, 0.8, 0.0, 0.5], dtype=np.float32),
    end_probs=np.array([0.4, 0.1, 0.3, 0.2], dtype=np.float32),
)


def test_viterbi_goldens():
    emissions = [
        np.array(
            [
                [0.2, 0.7, 0.1, 0.9],
                [0.1, 0.6, 0.8, 0.8],
                [0.8, 0.9, 0.3, 0.1],
                [0.9, 0.8, 0.3, 0.9],
            ],
            dtype=np.float32,
        ),
        np.array(
            [
                [0.6, 0.0, 0.5, 0.7],
                [0.1, 0.4, 0.1, 0.6],
                [0.3, 0.7, 0.3, 0.0],
            ],
            dtype=np.float32,
        ),
        np.array(
            [
                [0.5, 0.6, 0.7, 0.5],
                [0.9, 0.5, 0.4, 0.3],
                [0.0, 0.8, 0.9, 0.4],
                [0.8, 0.7, 0.5, 0.8],
                [0.7, 0.5, 0.8, 0.1],
            ],
            dtype=np.float32,
        ),
    ]
    expected = [[1, 3, 0, 0], [3, 3, 1], [3, 2, 2, 2, 2]]
    for em, want in zip(emissions, expected):
        assert GOLDEN_CRF.viterbi_decode(em) == want


def test_get_word_ids_goldens():
    cases = [
        ([(0, 3), (4, 6), (7, 10)], [(0, 3), (4, 6), (7, 10)], [0, 1, 2]),
        ([(0, 3), (4, 6), (7, 10)], [(0, 2), (3, 5), (6, 8)], [0, 1, 2]),
        ([(0, 3), (4, 6)], [(0, 2), (3, 5), (6, 8)], [0, 1, -1]),
        ([(3, 5), (8, 10)], [(0, 2), (5, 7)], [-1, -1]),
        ([(0, 2), (5, 7)], [(3, 5), (8, 10)], [-1, -1]),
        ([(0, 2), (3, 5), (6, 8)], [(0, 3), (4, 6), (7, 10)], [0, 1, 2]),
        ([(0, 3), (5, 7)], [(0, 1), (2, 4), (7, 10)], [0, 0, -1]),
        ([(0, 3), (6, 7), (7, 10)], [(0, 1), (3, 5), (8, 10)], [0, -1, 2]),
        ([(0, 3), (5, 8), (12, 14)], [(0, 3), (4, 6), (7, 10), (11, 13)], [0, 1, 1, 2]),
        ([], [(0, 3), (4, 6), (7, 10)], [-1, -1, -1]),
        ([(0, 3), (4, 6), (7, 10)], [], []),
    ]
    for word_offsets, token_offsets, want in cases:
        assert get_word_ids(word_offsets, token_offsets) == want


def test_aggregate_first_non_o_wins():
    tags = ["O", "NAME", "EMAIL", "O", "SSN"]
    word_ids = [0, 0, 0, 1, -1]
    assert aggregate_predictions(tags, word_ids, 2) == ["NAME", "O"]


def test_cnn_crf_model_end_to_end_deterministic():
    rng = np.random.RandomState(0)
    n = 19
    crf = CRF(
        transitions=rng.rand(n, n).astype(np.float32),
        start_probs=rng.rand(n).astype(np.float32),
        end_probs=rng.rand(n).astype(np.float32),
    )
    model = CnnCrfModel(crf)
    text = "Alice wrote to bob@example.com about the 12/11/2024 meeting".encode()
    e1 = model.predict(text)
    e2 = model.predict(text)
    assert e1 == e2  # fully deterministic
    raw = text
    for e in e1:
        # spans index the ORIGINAL text
        assert raw[e.start : e.end].decode("utf-8", "ignore") == e.text


def test_cnn_crf_model_in_registry():
    from ner_backend_spark.core.models import load_model

    rng = np.random.RandomState(1)
    n = 19
    params = {
        "transitions": rng.rand(n, n).tolist(),
        "start_probs": rng.rand(n).tolist(),
        "end_probs": rng.rand(n).tolist(),
    }
    model = load_model("cnn_crf", params)
    ents = model.predict(b"hello world this is a test of the tagger")
    assert isinstance(ents, list)
