"""Structured Streaming wrappers for the epoch-loop engine."""
