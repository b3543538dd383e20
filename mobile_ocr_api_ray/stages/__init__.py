"""Per-batch transforms and actor-pool stages (SURVEY.md §2.2/2.3/2.7)."""
