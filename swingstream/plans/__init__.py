"""Physical-plan inspection helpers (SURVEY.md §4.2 verification)."""
