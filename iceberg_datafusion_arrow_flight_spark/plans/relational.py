"""relational plans (filled in incrementally)."""
