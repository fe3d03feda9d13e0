"""Scalar / vectorized kernels: money, dates, html, text analysis."""
