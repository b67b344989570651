"""Scalar/columnar function layer: pure-Python cores + pandas-UDF wrappers."""
