"""Plan-inspection helpers: assert the physical plan is the one a
100 TB run needs (filters pushed to the scan, pruned read schema,
broadcast joins for dimensions, whole-stage codegen coverage)."""

from .inspect import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    tree,
)
