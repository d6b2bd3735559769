"""text analysis operators (filled in incrementally)."""
