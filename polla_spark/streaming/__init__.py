"""Structured Streaming surface: windows, watermarks, dedupe, and the
streaming form of the ingest->consensus->decide pipeline."""
