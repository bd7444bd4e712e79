"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: builds the full inverted index (stemming
on) over the sf0.001 documents corpus and runs a disjunctive BM25
top-k query through the distributed query path.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2 plus the training-data-pipeline families (dedup,
similarity search, text analysis); every query has a DuckDB oracle.
The stem-on queries' oracle is the pure-Python reference
implementation (oracle.py) materialized as a VALUES literal (Porter2
is not SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from invertedindex_spark import entry_queries  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    sf_dir = os.path.join(TESTDATA, "sf0.001")
    idx = entry_queries.get_index(spark, sf_dir, stemming=True)
    return idx.search_distributed("OR fast key order data table", k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_queries.all_queries()


def oracle_sql() -> dict[str, str]:
    # the driver runs oracles at sf0.01; the ANN oracles need that
    # scale's query vector (vec_id=0), fetched via duckdb directly
    import duckdb

    sf_dir = os.path.join(TESTDATA, "sf0.01")
    q = duckdb.sql(
        f"select embedding from '{sf_dir}/embeddings.parquet' "
        "where vec_id = 0").fetchone()[0]
    return entry_queries.all_oracle_sql([float(x) for x in q],
                                        sf_dir=sf_dir)


# -- beyond the driver contract: the demoted-twin registries ----------
# The external driver records at most 50 correctness rows, so
# all_queries() is capped at 50; these expose the remaining oracle-
# checked queries (verified by tests/test_entry_contract.py and the
# differential fuzz suites) for full sweeps:
#   {**queries(), **extra_queries()} / {**oracle_sql(), **extra_oracle_sql()}

def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_queries.extra_queries()


def extra_oracle_sql() -> dict[str, str]:
    sf_dir = os.path.join(TESTDATA, "sf0.01")
    return entry_queries.extra_oracle_sql(sf_dir=sf_dir)
