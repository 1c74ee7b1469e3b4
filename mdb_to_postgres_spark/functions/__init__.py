"""Scalar function families (SURVEY.md §2.7) and oracle-determinism helpers."""
