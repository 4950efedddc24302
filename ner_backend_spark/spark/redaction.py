"""Distributed PII redaction over a document table.

Reference semantics: internal/chat/session.go:67-107 — predict ->
FilterEntities -> sorted-span placeholder substitution with a stable
``[LABEL_n]`` assignment map. The reference scopes the map to a chat
session; here each document is its own session (fresh map per doc), which
is the only parallelizable scoping — cross-document stable maps would be a
global sequential assignment.

Arrow-batched mapInPandas; the compiled model is cached per executor worker
via the same mechanism as the tagger kernel.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..core.postprocess import filter_entities
from ..core.redact import TagMetadata, redact_spans
from .session import ensure_parallelism
from .tagger import ReportConfig, _compiled_state

REDACTED_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("redacted", StringType(), True),
        StructField("n_redactions", LongType(), False),
    ]
)


def redact_documents(
    docs: DataFrame, config: ReportConfig
) -> DataFrame:
    """(url, redacted, n_redactions): per-document placeholder redaction."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model, _tags, _custom, _groups = _compiled_state(config)
        for pdf in batches:
            urls, outs, counts = [], [], []
            for url, text in zip(pdf["url"].values, pdf["text"].values):
                tb = (text or "").encode("utf-8")
                ents = filter_entities(tb, model.predict(tb))
                redacted, meta = redact_spans(tb, ents, TagMetadata())
                urls.append(url)
                outs.append(redacted)
                counts.append(len(meta.tag_map))
            yield pd.DataFrame(
                {"url": urls, "redacted": outs, "n_redactions": counts}
            )

    narrow = ensure_parallelism(docs.select("url", "text"))
    return narrow.mapInPandas(run, REDACTED_SCHEMA)
