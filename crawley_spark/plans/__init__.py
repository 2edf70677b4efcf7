"""Physical-plan helpers: deterministic ordering, skew handling."""
