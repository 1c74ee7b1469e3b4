"""Plan inspection utilities (SURVEY.md §4)."""

from .inspect import explain_str, pushed_filters, scan_read_schema, uses_broadcast_join  # noqa: F401
