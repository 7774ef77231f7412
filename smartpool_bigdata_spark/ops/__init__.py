from smartpool_bigdata_spark.ops.relational import (
    latest_by_key,
    top_n_per_group,
    conditional_pivot,
    map_lookup,
    case_when_chain,
    range_flags,
    dedupe_exact,
    duplicate_keys,
    orphan_rows,
    tumbling_agg,
    with_audit_columns,
)

__all__ = [
    "with_audit_columns",
    "latest_by_key",
    "top_n_per_group",
    "conditional_pivot",
    "map_lookup",
    "case_when_chain",
    "range_flags",
    "dedupe_exact",
    "duplicate_keys",
    "orphan_rows",
    "tumbling_agg",
]
