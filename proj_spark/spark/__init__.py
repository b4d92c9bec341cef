"""Spark-facing layer: session tuning, pandas-UDF kernel wrappers."""
