"""Ingest sources: fixture HTML, polite HTTP, browser (stub), and the
source registry with per-source failure isolation."""
