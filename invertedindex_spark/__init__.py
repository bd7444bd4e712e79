"""invertedindex_spark — a PySpark-native full-text indexing + BM25
query engine with the query/data-processing capabilities of
terranovaa/InvertedIndex, re-architected Spark-first (see SURVEY.md).

Public API:

    from invertedindex_spark import (
        IndexConfig, build_index, InvertedIndex, corpus,
    )

    c = corpus.from_source_code(spark.read.parquet(...))
    build_index(spark, c, "/path/warehouse", IndexConfig())
    idx = InvertedIndex(spark, "/path/warehouse")
    idx.search("OR hello world", k=20)
"""

from .operators.build import IndexConfig, build_index, read_manifest
from .operators.query import InvertedIndex, queue_topk_np
from .operators.sharded import ShardedIndex
from .oracle import OracleIndex
from .sources import corpus

__all__ = [
    "IndexConfig", "build_index", "read_manifest",
    "InvertedIndex", "queue_topk_np", "ShardedIndex", "OracleIndex",
    "corpus",
]

__version__ = "0.1.0"
