"""Text-analysis operators for training-data pipelines."""
