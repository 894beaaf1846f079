"""Stateful components: robots rules, cuckoo-filter URL-seen shards,
per-host politeness scheduling (SURVEY.md §2.3)."""
