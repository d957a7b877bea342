"""Structured Streaming ingestion: incremental ping loading + sinks."""
