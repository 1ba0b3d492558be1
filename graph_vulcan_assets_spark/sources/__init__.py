"""Source readers beyond parquet (SURVEY.md §2.1 generalization)."""
