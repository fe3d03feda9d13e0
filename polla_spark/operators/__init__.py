"""Relational operators: consensus kernel, decision, dedup, similarity, text."""
