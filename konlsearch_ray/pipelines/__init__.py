"""Parity pipelines: search-log aggregation, suggestions, frequency top-k."""
