"""scalar_funcs plans (filled in incrementally)."""
