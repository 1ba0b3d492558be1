"""Structured Streaming ingestion (SURVEY.md §2.9)."""
