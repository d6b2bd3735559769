"""Custom operators the reference (or a 100 TB training-data pipeline)
needs that are not single Spark built-ins: deduplication families,
similarity search, text analysis, multimodal plumbing, recursive
iteration.  Each is a composition of DataFrame ops where semantics allow
(SURVEY §7.1 custom-operator ladder); Pandas UDFs only where genuinely
required (multimodal decode)."""

from . import dedup, similarity, text  # noqa: F401
