from .oracle import check_query, run_all

__all__ = ["check_query", "run_all"]
