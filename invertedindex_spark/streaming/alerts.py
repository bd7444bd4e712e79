"""Streaming percolation: saved-search alerting over an ingest stream.

``percolate_stream`` drives :func:`operators.percolate.percolate`
through Structured Streaming's ``foreachBatch`` — each micro-batch of
the corpus stream is matched against the registered query set and the
alerts land in a parquet sink partitioned by ``batch_id``. Replay
safety comes from dynamic partition overwrite: Structured Streaming
re-delivers an in-flight batch with the SAME batch_id after a restart,
and the rewrite then replaces exactly that batch's partition instead
of appending duplicates (the partials-write pattern,
``incremental.py``).

100 TB shape: identical to batch percolation — the query set is
broadcast, the batch tokenize is one narrow Arrow pass, and the alert
sink receives only matches. The stream never shuffles document text;
alerting rides the same micro-batch that ingest sees, so this composes
with ``start_incremental_build`` on the same source (two independent
writeStream queries over one stream)."""

from __future__ import annotations

import os

from ..operators.percolate import PercolatorQueries, percolate

__all__ = ["percolate_stream", "percolate_batch_to"]


def percolate_batch_to(batch_df, batch_id: int, queries: PercolatorQueries,
                       alerts_dir: str, *, id_col: str = "doc_no",
                       text_col: str = "content") -> None:
    """One micro-batch → alert rows (id, qid) under
    ``alerts_dir/batch_id=<n>/`` (dynamic overwrite — replay-safe).
    Usable directly from a hand-rolled foreachBatch."""
    out = percolate(batch_df, queries, id_col=id_col, text_col=text_col)
    from pyspark.sql import functions as F

    (out.withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(alerts_dir))


def percolate_stream(stream_df, queries: PercolatorQueries,
                     alerts_dir: str, *, id_col: str = "doc_no",
                     text_col: str = "content",
                     checkpoint_dir: str | None = None,
                     trigger: dict | None = None):
    """Start the alerting query: ``stream_df`` (a streaming DataFrame
    carrying ``id_col`` + ``text_col``) → parquet alert rows
    (``id_col``, qid, batch_id) in ``alerts_dir``. Returns the
    StreamingQuery handle."""
    if len(queries) == 0:
        raise ValueError(
            "percolate_stream needs at least one registered query")
    checkpoint_dir = checkpoint_dir or os.path.join(alerts_dir,
                                                    "_checkpoints")

    def process(batch_df, batch_id: int):
        percolate_batch_to(batch_df, batch_id, queries, alerts_dir,
                           id_col=id_col, text_col=text_col)

    writer = (stream_df.writeStream
              .foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def main(argv=None) -> int:
    """Batch alerting CLI: percolate a parquet corpus against a saved
    query TSV (the reference's ``qid \\t query`` batch format; the
    full percolator grammar — ``OR/AND/PHRASE/-term/BOOL …`` — is
    taken verbatim when the query names its own type, else wrapped as
    OR like the reference batch runner)::

        python -m invertedindex_spark.streaming.alerts \\
            docs.parquet queries.tsv alerts_out/ [--id-col doc_no]
            [--text-col content] [--no-stemming]
    """
    import argparse
    import json

    from ..operators.percolate import percolate, register_queries

    ap = argparse.ArgumentParser(
        prog="invertedindex_spark.streaming.alerts",
        description="batch percolation: corpus parquet × saved-search "
                    "TSV -> (id, qid) alert parquet")
    ap.add_argument("docs", help="corpus parquet path")
    ap.add_argument("queries", help="qid\\tquery TSV")
    ap.add_argument("out", help="alert parquet output dir")
    ap.add_argument("--id-col", default="doc_no")
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--no-stemming", action="store_true")
    args = ap.parse_args(argv)

    from pyspark import SparkContext
    from pyspark.sql import SparkSession

    _HEADS = ("OR ", "AND ", "PHRASE ", "BOOL ")
    pairs = []
    with open(args.queries, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\r\n")
            sep = line.find("\t")
            if not line or sep == -1:
                continue
            q = line[sep + 1:]
            if not q.upper().startswith(_HEADS):
                q = "OR " + q
            pairs.append((line[:sep], q))
    pq = register_queries(pairs, stemming=not args.no_stemming)

    own_session = SparkContext._active_spark_context is None
    spark = (SparkSession.builder.master("local[*]")
             .appName("invertedindex-alerts")
             .config("spark.ui.enabled", "false").getOrCreate())
    try:
        docs = spark.read.parquet(args.docs)
        out = percolate(docs, pq, id_col=args.id_col,
                        text_col=args.text_col)
        out.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(json.dumps({"queries": len(pq), "alerts": n,
                          "out": args.out}))
    finally:
        if own_session:
            spark.stop()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
