"""Physical-plan helpers: explicit partitioning, salting, skew defusal."""
