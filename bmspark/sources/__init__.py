"""Sources & sinks (SURVEY.md §2.1) — table scans, replay, catalog shim."""
