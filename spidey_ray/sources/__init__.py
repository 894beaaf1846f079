"""Sources: synthetic web backing store + fetcher stages (SURVEY.md §2.1)."""
