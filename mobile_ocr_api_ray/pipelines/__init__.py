"""End-to-end Ray Data pipelines (SURVEY.md §3)."""
