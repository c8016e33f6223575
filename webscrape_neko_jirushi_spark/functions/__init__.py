"""Column-level scalar logic: URL, text, and media-probe functions."""
