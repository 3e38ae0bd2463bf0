"""Scalar/vectorized function surface (SURVEY.md §2.2, §2.7, §2.9)."""
