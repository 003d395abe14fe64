"""Sources: custom scans feeding the engine (SURVEY.md §2.1)."""
