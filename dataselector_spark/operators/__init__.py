"""Composed relational operators (SURVEY.md §2 Part A/B realizations)."""
