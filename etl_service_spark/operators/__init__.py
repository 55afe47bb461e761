"""Data-plane operators (SURVEY.md §2.2) re-expressed Spark-first."""
