"""Structured Streaming ingestion (the modernized poll loop)."""
