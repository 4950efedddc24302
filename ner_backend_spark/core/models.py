"""Tagger models: text (bytes) -> list[Entity].

Mirrors the reference's ``Model`` interface and registry
(internal/core/model.go:13-75). Implemented here:

* ``RegexModel``    — the reference's test/harness model
                      (internal/integration_tests/utils.go:36-58).
* ``PresidioModel`` — the primary deterministic production-equivalent tagger
                      (internal/core/presidio.go:211-243).
* ``CnnCrfModel``   — lives in crf.py (CRF Viterbi decode path of
                      internal/core/onnx.go); registered lazily.

Models are stateless and picklable so a pandas UDF can hold one per executor
(the reference's "stateless model" shortcut, model.go:37-39).
"""

from __future__ import annotations

import re
from typing import Callable

from .entity import Entity, create_entity
from .recognizers import DEFAULT_PRESIDIO_THRESHOLD, load_recognizers


class RegexModel:
    """One regex per label; one entity per match, in sorted-label order.

    The Go version iterates a map (random order,
    internal/integration_tests/utils.go:40-57); we fix sorted(label) order
    for determinism. Order only matters for FilterEntities' same-label run
    merging, which is unaffected because per-label matches stay text-ordered.
    """

    def __init__(self, patterns: dict[str, str]):
        self.patterns: dict[str, re.Pattern] = {
            label: re.compile(p.encode("utf-8"))
            for label, p in sorted(patterns.items())
        }

    def predict(self, text: bytes) -> list[Entity]:
        entities: list[Entity] = []
        for label, pattern in self.patterns.items():
            for m in pattern.finditer(text):
                entities.append(create_entity(label, text, m.start(), m.end()))
        return entities


class PresidioModel:
    """Presidio-equivalent recognizer ensemble (presidio.go:227-243)."""

    def __init__(self, threshold: float = DEFAULT_PRESIDIO_THRESHOLD):
        self.recognizers = load_recognizers()
        self.threshold = threshold

    def predict(self, text: bytes) -> list[Entity]:
        entities: list[Entity] = []
        for pr in self.recognizers:
            for label, start, end, _score in pr.recognize(text, self.threshold):
                entities.append(create_entity(label, text, start, end))
        return entities

    def get_tags(self) -> list[str]:
        seen: set[str] = set()
        tags: list[str] = []
        for pr in self.recognizers:
            mapped = pr.mapped_label
            if mapped not in seen:
                seen.add(mapped)
                tags.append(mapped)
        return tags


def _load_cnn_crf(params: dict) -> object:
    from .crf import CnnCrfModel

    return CnnCrfModel.from_params(params)


def _load_merged(params: dict) -> object:
    """P5 ensemble: {'primary': {'type','params'}, 'secondary': {...}}."""
    from .ensemble import MergedModel

    p, s = params["primary"], params["secondary"]
    return MergedModel(
        load_model(p["type"], p.get("params")),
        load_model(s["type"], s.get("params")),
    )


def _load_python_class(params: dict) -> object:
    """P4 python plugin models (plugin/plugin-python; Go side
    internal/core/python/model.go:86-89): a user-supplied model class by
    dotted path, constructed with the params dict. The Spark rendering of
    the reference's out-of-process plugin: the class resolves inside each
    executor worker (config ships only the import path — no pickled code),
    so any importable ``predict(bytes) -> list[Entity]`` implementation
    plugs into the tagger kernel unchanged."""
    import importlib

    module_path, _, cls_name = params["class"].rpartition(".")
    cls = getattr(importlib.import_module(module_path), cls_name)
    return cls(params)


# Registry, mirroring NewModelLoaders (model.go:56-75). Loaders take a params
# dict rather than a model dir: this engine ships model state via Spark
# broadcast, not via object-store downloads.
MODEL_LOADERS: dict[str, Callable[[dict], object]] = {
    "regex": lambda params: RegexModel(params["patterns"]),
    "presidio": lambda params: PresidioModel(
        params.get("threshold", DEFAULT_PRESIDIO_THRESHOLD)
    ),
    "cnn_crf": _load_cnn_crf,
    "merged": _load_merged,
    "python_class": _load_python_class,
}


def load_model(model_type: str, params: dict | None = None) -> object:
    if model_type not in MODEL_LOADERS:
        raise ValueError(f"invalid model type: {model_type}")
    return MODEL_LOADERS[model_type](params or {})
