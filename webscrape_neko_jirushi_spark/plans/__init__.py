"""Catalyst plan introspection: pushdown/broadcast/codegen assertions."""
