"""End-to-end pipelines composed from stages (SURVEY.md §3)."""
