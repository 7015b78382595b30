"""Reusable column-expression builders (JVM-side; no Python UDFs)."""
