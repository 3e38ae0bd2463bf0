"""Structured Streaming runner (SURVEY.md §2.8) — the always-on daemon analog."""
