"""Spark-facing operators: extraction stages + training-data ops."""
