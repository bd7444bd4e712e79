"""The reference's literal input formats: collection.tar.gz
(docno \\t content lines, malformed-line policy) and queries.tsv
(qid \\t query, run as OR). End-to-end: tar.gz -> build -> TSV batch ->
TREC run lines, results checked against the pure-Python oracle."""

import gzip
import io
import os
import tarfile

from invertedindex_spark import (
    IndexConfig, InvertedIndex, OracleIndex, build_index, corpus,
)

LINES = [
    "doc1\tthe quick brown fox jumps over the lazy dog",
    "doc2\toptimization throughput latency compression pointer",
    "malformed line without a tab",                     # skipped
    "doc3\t",                                           # empty content
    "doc4\tcafé naïve résumé unicode handling test",
    "doc5\tthe quick brown compression fox",
]


def _write_targz(path):
    buf = io.BytesIO()
    data = ("\n".join(LINES) + "\n").encode("utf-8")
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        info = tarfile.TarInfo("collection.tsv")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def test_targz_to_trec_run_end_to_end(spark, tmp_path):
    tgz = str(tmp_path / "collection.tar.gz")
    _write_targz(tgz)
    c = corpus.from_targz(spark, tgz)

    # the same rows the reference would index, in read order
    want_rows = []
    for line in LINES:
        sep = line.find("\t")
        if sep == -1:
            continue
        want_rows.append((line[:sep], line[sep + 1:]))
    got_rows = [(r["doc_no"], r["content"]) for r in c.df.collect()]
    assert got_rows == want_rows

    wh = str(tmp_path / "wh")
    build_index(spark, c, wh, IndexConfig(num_blocks=2))
    idx = InvertedIndex(spark, wh)
    oracle = OracleIndex(want_rows, stopwords=True, stemming=True)
    assert idx.num_docs == oracle.num_docs  # doc3 dropped, others dense

    tsv = str(tmp_path / "queries.tsv")
    with open(tsv, "w") as f:
        f.write("q1\tquick fox\nq2\tcompression\n\nbad-line\n")
    queries = corpus.load_queries_tsv(tsv)
    assert queries == [("q1", "OR quick fox"), ("q2", "OR compression")]

    lines = idx.trec_run_lines(queries, k=10, tag="01")
    # mirror the reference's TREC output against the oracle
    want = []
    for qid, q in queries:
        for rank, (doc_no, score) in enumerate(oracle.topk(q, 10), 1):
            want.append(f"{qid} Q0 {doc_no} {rank} {score} 01")
    assert lines == want


def test_cli_batch_mode(spark, tmp_path, capsys):
    """CLI --batch: TSV in, TREC run file out (reference workflow)."""
    from invertedindex_spark import cli

    tgz = str(tmp_path / "collection.tar.gz")
    _write_targz(tgz)
    wh = str(tmp_path / "wh_cli")
    build_index(spark, corpus.from_targz(spark, tgz), wh,
                IndexConfig(num_blocks=2))
    tsv = str(tmp_path / "queries.tsv")
    with open(tsv, "w") as f:
        f.write("q1\tquick fox\nq2\tcompression\n")
    out = str(tmp_path / "run.txt")
    rc = cli.main([wh, "--batch", tsv, "--out", out, "-k", "10"])
    assert rc == 0
    lines = open(out).read().strip().splitlines()
    assert len(lines) > 0
    for ln in lines:
        qid, q0, doc_no, rank, score, tag = ln.split(" ")
        assert q0 == "Q0" and tag == "01"
        float(score); int(rank)
