"""Byte-format parity: export a built warehouse to the reference's
.dat layout and verify record sizes, ordering and payload round-trips
(Constants.java:34-41, LexiconTerm/Document.serializeBinary)."""

import os
import struct

import numpy as np
import pytest

from invertedindex_spark import IndexConfig, OracleIndex, build_index, corpus
from invertedindex_spark.sources import datfmt


@pytest.fixture(scope="module")
def exported(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh"))
    out = str(tmp_path_factory.mktemp("dat"))
    # doc_no must fit 30 bytes → use the documents-table corpus
    import os as _os
    c = corpus.load_documents_corpus(
        spark, _os.environ.get("SPARK_GRAFT_TESTDATA",
                               "/root/testdata") + "/sf0.001")
    build_index(spark, c, wh, IndexConfig(num_blocks=4))
    sizes = datfmt.export_dat(wh, out)
    return spark, wh, out, sizes


def test_record_sizes(exported):
    spark, wh, out, sizes = exported
    n_docs = spark.read.parquet(f"{wh}/docs").count()
    n_terms = spark.read.parquet(f"{wh}/lexicon").count()
    assert sizes["document_table.dat"] == n_docs * 38
    assert sizes["lexicon.dat"] == n_terms * 60
    assert sizes["collection_statistics.dat"] == 12


def test_stats_roundtrip(exported):
    spark, wh, out, _ = exported
    srow = spark.read.parquet(f"{wh}/stats").collect()[0]
    n, avg = datfmt.read_stats_dat(out)
    assert n == srow["num_docs"]
    assert avg == srow["avg_doc_len"]


def test_doc_table_roundtrip(exported):
    spark, wh, out, _ = exported
    disk = datfmt.read_doc_table_dat(out)
    rows = spark.read.parquet(f"{wh}/docs").orderBy("doc_id").collect()
    assert len(disk) == len(rows)
    for (did, dno, dlen), r in zip(disk, rows):
        assert (did, dno, dlen) == (r["doc_id"], r["doc_no"], r["doc_len"])


def test_lexicon_sorted_and_roundtrip(exported):
    spark, wh, out, _ = exported
    lex = datfmt.read_lexicon_dat(out)
    terms = [e["term"] for e in lex]
    assert terms == sorted(terms)  # binary-search invariant
    got = {e["term"]: e for e in lex}
    for r in spark.read.parquet(f"{wh}/lexicon").collect():
        e = got[r["term"]]
        assert e["df"] == r["df"] and e["cf"] == r["cf"]
        assert e["term_upper_bound"] == pytest.approx(
            r["term_upper_bound"], rel=1e-12)


def test_postings_decode_via_offsets(exported):
    """Every term's postings must decode from the .dat files using only
    the lexicon offsets/sizes — the reference's read path."""
    spark, wh, out, _ = exported
    from invertedindex_spark.functions import codec

    lex = datfmt.read_lexicon_dat(out)
    post = {r["term"]: r for r in
            spark.read.parquet(f"{wh}/postings").collect()}
    for e in lex:
        doc_ids, tfs, skips = datfmt.read_postings_dat(out, e)
        want_ids = codec.gap_decode(codec.vbyte_decode(
            post[e["term"]]["doc_ids_vbyte"]))
        assert np.array_equal(doc_ids, want_ids), e["term"]
        assert tfs.sum() == e["cf"]
        assert len(doc_ids) == e["df"]


def test_contiguous_offsets(exported):
    """Offsets must tile the payload files exactly (no gaps/overlap)."""
    _s, _wh, out, sizes = exported
    lex = datfmt.read_lexicon_dat(out)
    pos_d = pos_f = 0
    for e in lex:
        assert e["doc_ids_offset"] == pos_d
        assert e["freqs_offset"] == pos_f
        pos_d += e["doc_ids_size"]
        pos_f += e["freqs_size"]
    assert pos_d == sizes["postings_doc_ids.dat"]
    assert pos_f == sizes["postings_frequencies.dat"]


def test_long_docno_rejected(spark, tmp_path):
    wh = str(tmp_path / "wh")
    c = corpus.synthesize_source_code(spark, 60, seed=3)  # long doc_nos
    build_index(spark, c, wh, IndexConfig(num_blocks=2))
    with pytest.raises(ValueError, match="exceeds 30 bytes"):
        datfmt.export_dat(wh, str(tmp_path / "dat"))


# ---------------------------------------------------------------------
# textual debug sink (TextualIndexer.java:21-80)
# ---------------------------------------------------------------------

@pytest.fixture(scope="module")
def exported_txt(exported, tmp_path_factory):
    spark, wh, _out, _sizes = exported
    out = str(tmp_path_factory.mktemp("txt"))
    datfmt.export_txt(wh, out)
    return spark, wh, out


def test_txt_lexicon_roundtrip(exported_txt):
    spark, wh, out = exported_txt
    disk = datfmt.read_lexicon_txt(out)
    lex = {r["term"]: (r["df"], r["cf"]) for r in
           spark.read.parquet(f"{wh}/lexicon").collect()}
    assert [e["term"] for e in disk] == sorted(lex)  # TreeMap order
    for e in disk:
        assert (e["df"], e["cf"]) == lex[e["term"]]


def test_txt_postings_roundtrip(exported_txt):
    """The decoded text postings must equal the logical posting lists
    (absolute ascending docIds, aligned tfs, df/cf consistent)."""
    from invertedindex_spark import InvertedIndex

    spark, wh, out = exported_txt
    disk_lex = datfmt.read_lexicon_txt(out)
    disk_posts = datfmt.read_postings_txt(out)
    assert len(disk_lex) == len(disk_posts)
    idx = InvertedIndex(spark, wh)
    want = {}
    for r in idx.decoded_postings_df().collect():
        want.setdefault(r["term"], []).append((r["doc_id"], r["tf"]))
    for e, (ids, tfs) in zip(disk_lex, disk_posts):
        pairs = sorted(want[e["term"]])
        assert ids == [d for d, _ in pairs], e["term"]
        assert tfs == [t for _, t in pairs], e["term"]
        assert e["df"] == len(ids) and e["cf"] == sum(tfs)
        assert ids == sorted(ids)


def test_txt_doc_table_roundtrip(exported_txt):
    spark, wh, out = exported_txt
    disk = datfmt.read_doc_table_txt(out)
    rows = spark.read.parquet(f"{wh}/docs").orderBy("doc_id").collect()
    assert [(d, n, l) for d, n, l in disk] == \
        [(r["doc_id"], r["doc_no"], r["doc_len"]) for r in rows]


def test_txt_export_supports_pfd(spark, tmp_path):
    """The textual sink decodes, so it must work where .dat cannot."""
    wh = str(tmp_path / "pfd")
    rows = corpus.synthesize_source_code_rows(120, seed=42)
    df = spark.createDataFrame(rows, corpus._CORPUS_SCHEMA)
    build_index(spark, corpus.from_source_code(df), wh,
                IndexConfig(num_blocks=2, codec="pfd"))
    with pytest.raises(ValueError):
        datfmt.export_dat(wh, str(tmp_path / "dat"))
    out = str(tmp_path / "txt")
    datfmt.export_txt(wh, out)
    lex = datfmt.read_lexicon_txt(out)
    posts = datfmt.read_postings_txt(out)
    assert len(lex) == len(posts) > 0
    for e, (ids, tfs) in zip(lex, posts):
        assert e["df"] == len(ids) and e["cf"] == sum(tfs)
