"""Sources/sinks: reference text format (see operators/ingest.py) and
multimodal binary-column plumbing."""
