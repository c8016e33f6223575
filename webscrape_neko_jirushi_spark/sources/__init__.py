"""Sources/sinks and deterministic analog-table derivations."""
