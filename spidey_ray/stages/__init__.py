"""map_batches stages (SURVEY.md §2.2): parse, link checks, dedup, index."""
