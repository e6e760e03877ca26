"""Source / sink plane — the reference's storage providers and publishers
re-expressed as Spark readers/writers (SURVEY.md §2.1, §2.3)."""
