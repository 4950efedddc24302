"""Spark-side operators: DataFrame pipelines over the core semantics."""
