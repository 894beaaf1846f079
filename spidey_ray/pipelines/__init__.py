"""Pipelines: crawl driver, serial oracle, filter/indexer/query (SURVEY.md §3)."""
