"""Corpus sources: adapters onto the engine's canonical corpus shape.

Canonical corpus = ``(doc_no string, content string)`` plus the ordered
key columns that define docId assignment order. The reference consumed
``collection.tar.gz`` lines ``docno \\t content`` in file order
(``Indexer.java:57-85``); a distributed engine has no "file order", so
every adapter declares an explicit, deterministic total order
(SURVEY.md §7.3).

Adapters:

* :func:`from_source_code` — the BASELINE.json ``input_hint`` shape
  ``(repo, path, commit, lang, content)``; ``doc_no = repo:path@commit``;
  order = (repo, path, commit).
* :func:`from_documents` — the driver testdata ``documents`` table
  ``(doc_id, text, lang, source, n_chars)``; order = doc_id.
* :func:`synthesize_source_code` — deterministic seeded corpus in the
  input_hint shape (FIXTURES.md §1) for tests and benchmarks: includes
  punctuation-only rows (tokenize to [], skipped), all-stopword rows (docId
  skip rule), empty rows, repeated terms, and one hot term with
  df > 1024 at ``n >= 2500`` (skip-pointer + skew coverage).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Corpus:
    """A DataFrame with (order keys…, doc_no, content).

    ``order_keys=()`` selects **input order**: docIds follow the
    source's own partition/row order (for parquet: file-split order) —
    exactly the reference's "collection read order"
    (``Indexer.java:57-85``), deterministic for a fixed file layout, and
    shuffle-free: the build stays narrow until the term merge. Explicit
    ``order_keys`` instead define a content-addressed total order
    (stable across file layouts) at the cost of one range exchange.
    """
    df: object                      # pyspark DataFrame
    order_keys: tuple[str, ...]     # () = input order


def from_source_code(df, input_order: bool = False) -> Corpus:
    """(repo, path, commit, lang, content) → canonical corpus.
    ``input_order=True`` keeps the source's own row order for docIds
    (shuffle-free build; see Corpus docstring)."""
    from pyspark.sql import functions as F

    # concat (null-propagating), NOT concat_ws: concat_ws silently
    # skips NULL keys, so ('a','b',NULL) and ('a','b','') would collide
    # on the same doc_no — the identity key of the docs table and the
    # .dat export. Rows with a NULL identity key are dropped like any
    # other malformed input line (the indexer's malformed-line policy).
    out = df.select(
        "repo", "path", "commit",
        F.concat(F.col("repo"), F.lit(":"), F.col("path"),
                 F.lit("@"), F.col("commit")).alias("doc_no"),
        F.col("content"),
    ).where(F.col("doc_no").isNotNull())
    return Corpus(out, () if input_order else ("repo", "path", "commit"))


def from_documents(df) -> Corpus:
    """Driver testdata documents(doc_id, text, …) → canonical corpus."""
    from pyspark.sql import functions as F

    out = df.select(
        F.col("doc_id").alias("src_doc_id"),
        F.col("doc_id").cast("string").alias("doc_no"),
        F.col("text").alias("content"),
    )
    return Corpus(out, ("src_doc_id",))


def load_documents_corpus(spark, sf_dir: str) -> Corpus:
    return from_documents(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def from_targz(spark, path: str) -> Corpus:
    """``collection.tar.gz`` → canonical corpus — the reference's exact
    input (``Indexer.indexCollection``, Indexer.java:57-85): archive
    members are text streams of ``docno \\t content`` lines, UTF-8 with
    malformed bytes replaced; lines without a tab are skipped (the
    malformed-line policy), empty documents are dropped downstream.
    docIds follow archive read order (``order_keys=()`` = input order),
    matching the reference's docId assignment.

    Scale note: a .tar.gz is not splittable — each archive decodes in
    ONE task, so parallelism = number of archives. This source exists
    for drop-in parity with the reference's input; for 100 TB, ingest
    once to parquet (``corpus_to_parquet``-style staging) and build
    from that.
    """
    rdd = spark.sparkContext.binaryFiles(path)

    def parse(it):
        import io
        import tarfile

        for _fname, content in it:
            with tarfile.open(fileobj=io.BytesIO(content),
                              mode="r:gz") as tf:
                for member in tf:
                    f = tf.extractfile(member)
                    if f is None:
                        continue
                    for line in io.TextIOWrapper(f, encoding="utf-8",
                                                 errors="replace"):
                        line = line.rstrip("\r\n")
                        sep = line.find("\t")
                        if sep == -1:
                            continue  # malformed line, no \t (:75-78)
                        yield (line[:sep], line[sep + 1:])

    df = rdd.mapPartitions(parse).toDF(["doc_no", "content"])
    return Corpus(df, ())


def load_queries_tsv(path: str, qtype: str = "OR") -> list:
    """``queries.tsv`` (``qid \\t query`` per line) → [(qid, "OR query")]
    — the reference's batch-query input (QueryProcessorTest.java:80-98,
    which runs every TSV query as ``"OR " + query``). Feed to
    ``InvertedIndex.batch_search`` / ``batch_search_distributed`` /
    ``trec_run_lines``."""
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\r\n")
            if not line:
                continue
            sep = line.find("\t")
            if sep == -1:
                continue
            out.append((line[:sep], f"{qtype} {line[sep + 1:]}"))
    return out


# ---------------------------------------------------------------------
# Deterministic synthetic source-code corpus (input_hint shape)
# ---------------------------------------------------------------------

_KEYWORDS = (
    "def class import return public static void int string let const "
    "function module package println printf assert raise throw catch "
    "finally lambda yield async await select insert update delete index "
    "merge partition shuffle broadcast executor driver schema column "
    "filter aggregate window stream batch commit rollback vector token "
    "parse compile link build deploy test bench profile trace debug"
).split()

_WORDS = (
    "alpha beta gamma delta epsilon zeta theta kappa sigma omega "
    "quick brown fox jumps lazy dog running jumped swimming parties "
    "national generation agreement hoping hopped studies "
    "optimization vectorized throughput latency compression pointer "
    "dictionary frequency document collection statistic ranking"
).split()

_EXTS = {"py": "python", "java": "java", "scala": "scala",
         "md": "markdown", "txt": "text"}


def synthesize_source_code_row(i: int, seed: int = 42,
                               hot_term: str = "hotterm"):
    """Row i of the deterministic corpus — derived purely from (seed, i)
    so it can be generated distributively with identical results."""
    import hashlib
    import random

    exts = sorted(_EXTS)
    rng = random.Random(seed * 1_000_003 + i)
    repo = f"org{i % 7}/repo{i % 13}"
    ext = exts[i % len(exts)]
    path = f"src/m{i % 11}/file_{i}.{ext}"
    commit = hashlib.sha1(f"{repo}:{path}:{seed}".encode()).hexdigest()[:8]
    kind = i % 17
    if kind == 0:
        content = ""                           # skipped: empty
    elif kind == 1:
        content = "!!! ... ***"    # all-separator: no tokens, skipped
    elif kind == 2:
        content = "the of and is are was"      # all stopwords -> no docId
    else:
        k = rng.randint(3, 40)
        words = [rng.choice(_KEYWORDS if rng.random() < 0.5 else _WORDS)
                 for _ in range(k)]
        if rng.random() < 0.3:                 # repeated terms (tf > 1)
            words += words[:3]
        if rng.random() < 0.55:                # hot term: df > n/2
            words.insert(rng.randrange(len(words) + 1), hot_term)
        if rng.random() < 0.1:
            words.append("x" * rng.randint(21, 30))   # truncation path
        if rng.random() < 0.15:
            words.append(str(rng.randint(0, 99999)))  # numeric tokens
        sep = rng.choice([" ", ", ", "(", ") ", "_", "\t"])
        content = sep.join(words)
    return (repo, path, commit, _EXTS[ext], content)


def synthesize_source_code_rows(n: int, seed: int = 42,
                                hot_term: str = "hotterm"):
    """Pure-Python generator of n corpus rows (tests + oracle)."""
    return [synthesize_source_code_row(i, seed, hot_term) for i in range(n)]


_CORPUS_SCHEMA = ("repo string, path string, commit string, lang string, "
                  "content string")


def synthesize_source_code(spark, n: int, seed: int = 42,
                           num_partitions: int | None = None,
                           input_order: bool = False) -> Corpus:
    """Distributed deterministic corpus: rows derive from the row index,
    so generation is an embarrassingly-parallel ``spark.range`` map —
    no driver-side materialization at any n. ``input_order=True`` makes
    docIds follow generation order (shuffle-free build)."""
    if n <= 2000:
        df = spark.createDataFrame(synthesize_source_code_rows(n, seed),
                                   _CORPUS_SCHEMA)
        if num_partitions and not input_order:
            # repartition would scramble row order, so skip it when the
            # caller asked for input-order docIds — the flag must mean
            # the same thing at every n
            df = df.repartition(num_partitions)
        return from_source_code(df, input_order=input_order)

    import pandas as pd

    base = spark.range(0, n, 1, num_partitions or
                       spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            rows = [synthesize_source_code_row(int(i), seed)
                    for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["repo", "path", "commit",
                                              "lang", "content"])

    return from_source_code(base.mapInPandas(gen, _CORPUS_SCHEMA),
                            input_order=input_order)
