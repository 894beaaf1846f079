"""Pure scalar/vector function library (SURVEY.md §2.8)."""
