"""Relational operators: spans, frontier, dedup, cleaning, similarity."""
