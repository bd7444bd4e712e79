"""Physical-plan inspection utilities.

The reference engine's physical layer is hand-coded (mmap binary
search, fixed-width record addressing — DiskDataStructuresSearch.java);
in this engine those properties come from Catalyst + the parquet
source, so they are *asserted*, not assumed: tests use these helpers to
verify that point lookups push their predicates into the scan and that
payload columns are pruned when not selected. At 100 TB a scan that
misses pushdown or pruning is the difference between touching a few MB
and the whole table.
"""

from __future__ import annotations


def physical_plan(df) -> str:
    """Executed (post-AQE-planning) physical plan as a string.

    Rendered with a large spark.sql.maxMetadataStringLength: the
    default (100) truncates ReadSchema/PushedFilters clauses, which
    would make the assert helpers below silently pass on columns that
    were elided from the string, not pruned from the scan."""
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "100000")
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def analyzed_plan(df) -> str:
    """Analyzed logical plan as a string — where explicit join-strategy
    hints (``F.broadcast`` → ``ResolvedHint``) are still visible before
    the optimizer folds them into a physical strategy. Used to assert
    that an operator does NOT force a broadcast on a side that can be
    large (AQE may still *choose* one when the side is actually small —
    that choice shows only in the physical plan and is fine)."""
    return df._jdf.queryExecution().analyzed().toString()


def count_broadcast_hints(df) -> int:
    """Number of explicit broadcast hints in the analyzed plan."""
    import re

    return len(re.findall(r"ResolvedHint.*(?i:broadcast)",
                          analyzed_plan(df)))


def formatted_plan(df) -> str:
    """The `.explain("formatted")` text (scan details incl. PushedFilters
    and ReadSchema)."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return qe.explainString(mode)


def scan_read_schemas(df) -> list[str]:
    """ReadSchema clause of every parquet scan in the plan."""
    out = []
    for chunk in physical_plan(df).split("ReadSchema: ")[1:]:
        out.append(chunk.splitlines()[0])
    return out


def pushed_filters(df) -> list[str]:
    """PushedFilters clause of every parquet scan in the plan."""
    out = []
    for chunk in physical_plan(df).split("PushedFilters: ")[1:]:
        out.append(chunk.splitlines()[0])
    return out


def assert_column_pruned(df, column: str) -> None:
    """Fail if any scan in the plan reads ``column``. Word-boundary
    match so e.g. 'id' does not false-positive on 'doc_id:'."""
    import re

    schemas = scan_read_schemas(df)
    assert schemas, "no parquet scan found in plan"
    pat = re.compile(r"(?<![A-Za-z0-9_])" + re.escape(column) + ":")
    for s in schemas:
        assert not pat.search(s), (
            f"column {column!r} not pruned from scan: {s}")


def partition_filters(df) -> list[str]:
    """PartitionFilters clause of every parquet scan in the plan."""
    out = []
    for chunk in physical_plan(df).split("PartitionFilters: ")[1:]:
        out.append(chunk.splitlines()[0])
    return out


def assert_partition_pruned(df, fragment: str) -> None:
    """Fail unless some scan's PartitionFilters mentions ``fragment``
    (a partition column constrained to specific values — the scan then
    lists only those directories instead of the whole table)."""
    filters = partition_filters(df)
    assert any(fragment in f for f in filters), (
        f"no partition filter mentioning {fragment!r}; "
        f"PartitionFilters: {filters}")


def assert_filter_pushed(df, fragment: str) -> None:
    """Fail unless some scan's PushedFilters mentions ``fragment``
    (e.g. a column name of an In/EqualTo predicate)."""
    filters = pushed_filters(df)
    assert any(fragment in f for f in filters), (
        f"no pushed filter mentioning {fragment!r}; "
        f"PushedFilters: {filters}")
