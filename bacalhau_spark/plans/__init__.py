"""Plan-level services: validation and canonicalization (SURVEY.md §4)."""
