"""PySpark-native KG-construction / NER-scanning engine.

A from-scratch reimplementation of the capabilities of ThirdAILabs/ner-backend
(reference at /root/reference, cited per-file) with an idiomatic Spark
architecture: DataFrame/SQL logical plans, Arrow-batched pandas UDFs for the
text->entities transform, broadcast joins for small config/dictionaries, and
partition-grained checkpointing for resume.

Layout:
  core/    pure-Python reference semantics (byte-exact vs the Go code paths);
           shared by the pandas-UDF batch kernels and by the pytest oracle.
  spark/   DataFrame pipelines: extraction, tagging, groups, KG construction,
           dedup, similarity, text stats, checkpointing.
  streaming/ Structured Streaming variants of the ingest pipeline.
"""

__version__ = "0.1.0"
