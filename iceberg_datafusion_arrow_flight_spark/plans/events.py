"""events plans (filled in incrementally)."""
