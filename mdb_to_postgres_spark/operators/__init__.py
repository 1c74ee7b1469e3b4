"""Relational operators (SURVEY.md §2.1-2.6)."""
