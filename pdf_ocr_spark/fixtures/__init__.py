"""Deterministic synthetic corpus generation (FIXTURES.md §1)."""
