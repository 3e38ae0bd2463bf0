"""Pipeline plans: declarative spec compiler + lineage/resume (SURVEY.md §3.2, §4.3.4)."""
