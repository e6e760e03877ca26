"""Structured Streaming surfaces (SURVEY.md §2.6 streaming row)."""
