"""Relational operators (SURVEY.md §2.3-§2.6): enrich joins, fan-out
router, aggregates, windows, skew mitigation."""
