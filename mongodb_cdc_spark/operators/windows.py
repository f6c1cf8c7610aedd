"""windows operators — filled in as coverage widens (SURVEY.md §2B)."""
