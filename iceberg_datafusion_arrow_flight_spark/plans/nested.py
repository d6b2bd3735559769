"""nested plans (filled in incrementally)."""
