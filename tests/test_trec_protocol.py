"""End-to-end TREC evaluation protocol over the pure-Python oracle
(PDF §5.1 / QueryProcessorTest.java:76-108 shape): batch queries →
run file lines → mAP/RR/nDCG. Engine parity is covered separately by
rank-identity tests; this guards the evaluation glue itself."""

import random

from invertedindex_spark.metrics import evaluate_run
from invertedindex_spark.oracle import OracleIndex
from invertedindex_spark.sources.corpus import synthesize_source_code_rows


def test_trec_protocol_with_oracle():
    rows = [(f"{r}:{p}@{c}", content) for r, p, c, _l, content in
            sorted(synthesize_source_code_rows(300, seed=5),
                   key=lambda x: (x[0], x[1], x[2]))]
    oracle = OracleIndex(rows)
    vocab = ["hotterm", "quick", "optimization", "throughput", "import",
             "class", "partition", "window", "national", "parties"]
    rng = random.Random(5)
    queries = [(qid, "OR " + " ".join(rng.sample(vocab, 3)))
               for qid in range(20)]
    run_lines = []
    qrel_lines = []
    for qid, q in queries:
        res = oracle.topk(q, 100)
        for rank, (doc_no, score) in enumerate(res, start=1):
            run_lines.append(f"{qid} Q0 {doc_no} {rank} {score} 01")
        # seeded qrels: mark a mix of retrieved and random docs relevant
        rels = {doc_no for doc_no, _ in res[:3]}
        rels |= {rows[rng.randrange(len(rows))][0] for _ in range(3)}
        for doc_no in rels:
            qrel_lines.append(f"{qid} Q0 {doc_no} 1")
    m = evaluate_run(run_lines, qrel_lines)
    # top-3 retrieved docs are relevant by construction → strong metrics
    assert m["map"] > 0.3
    assert m["rr"] > 0.6
    assert 0 < m["ndcg@10"] <= 1 and 0 < m["ndcg@100"] <= 1
