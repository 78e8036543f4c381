"""The Spark extraction job (SURVEY.md §4.3 target plan)."""
