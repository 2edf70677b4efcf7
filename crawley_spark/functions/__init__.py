"""Scalar/extraction function layer (kernel wrappers + Spark UDF builders)."""
