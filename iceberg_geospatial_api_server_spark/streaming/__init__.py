"""Structured Streaming operators: windowed aggregation with watermarks,
session windows, foreachBatch sinks."""
