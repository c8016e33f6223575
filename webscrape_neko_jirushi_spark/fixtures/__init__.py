"""Deterministic synthetic fixtures: site mirror + images metadata."""
