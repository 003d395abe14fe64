"""Scalar-function layer (SURVEY.md §2.9, §2.11)."""
