"""Distributed BPE tokenizer training + encoding (Sennrich, Haddow &
Birch, ACL 2016 — learned from the published algorithm, no reference
implementation involved; the reference engine has no subword
tokenizer, this is a training-data-pipeline extension).

Shape for 100 TB: BPE trains on WORD FREQUENCIES, so the corpus is
reduced once — one tokenize + groupBy(word) shuffle — to a word-count
table (vocabulary-sized, orders of magnitude smaller than the corpus).
Every merge iteration then runs on that small table only: explode the
adjacent symbol pairs weighted by word count, pick the argmax pair
(count desc, pair asc — a total, data-independent tie order), fold the
merge into each word's symbol array, checkpoint. Encoding reuses the
trained table: corpus token counts come from joining exploded words
against the word → symbol-count map — the corpus is never re-encoded
word by word.

Determinism: counts are integers, the argmax tie-breaks
lexicographically, and the merge fold is the standard left-to-right
greedy pass — two independent implementations (this one and the pure-
Python twin below) agree exactly, which is what the driver-style
oracle checks.
"""

from ..functions.textproc import tokens_col

EOW = "_"          # end-of-word marker symbol (tokens are [a-z0-9]+,
                   # so '_' can never collide with a character symbol)


def word_counts(docs_df, text_col: str = "text"):
    """(word, n) over the RAW token stream (no stopword removal — a
    tokenizer sees every word; the leading-empty-token quirk rows are
    dropped, '' is not a word)."""
    from pyspark.sql import functions as F

    return (docs_df
            .select(F.explode(tokens_col(F.col(text_col)))
                    .alias("word"))
            .where(F.col("word") != "")
            .groupBy("word").agg(F.count("*").alias("n")))


def _initial_seq(word_col):
    """word → array of single-character symbols + the EOW marker."""
    from pyspark.sql import functions as F

    chars = F.split(word_col, "")
    return F.concat(chars, F.array(F.lit(EOW)))


def _fold_merge(seq_col, a: str, b: str):
    """One BPE merge applied to a symbol array: the standard greedy
    left-to-right pass — append each symbol, but when the accumulator
    ends with ``a`` and the incoming symbol is ``b``, replace that
    tail with ``a+b`` (so 'a a a' under merge (a,a) → ['aa','a'],
    never ['a','aa']). All-JVM array aggregate."""
    from pyspark.sql import functions as F

    merged = a + b
    return F.aggregate(
        seq_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(merged))))
        .otherwise(F.concat(acc, F.array(x))))


def train_bpe(docs_df, num_merges: int = 32, text_col: str = "text",
              min_count: int = 2):
    """Learn ``num_merges`` BPE merges. Returns (merges, vocab_df):
    merges = [(a, b), ...] in learned order; vocab_df = the final
    (word, n, seq) table — ``size(seq)`` is each word's encoded
    length, reusable for corpus-wide encoding without re-folding."""
    from pyspark.sql import functions as F

    wc = word_counts(docs_df, text_col)
    vocab = (wc.select("word", "n",
                       _initial_seq(F.col("word")).alias("seq"))
             .localCheckpoint(eager=True))
    merges: list = []
    for _i in range(int(num_merges)):
        # a fully-merged word has ONE symbol; sequence(1, 0) would
        # DESCEND in Spark and index out of bounds — guard to empty
        pair_arr = F.when(
            F.size("seq") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("seq") - 1),
                lambda j: F.concat_ws(
                    " ", F.element_at(F.col("seq"), j),
                    F.element_at(F.col("seq"), j + 1)))) \
            .otherwise(F.array().cast("array<string>"))
        pairs = (vocab
                 .select("n", F.explode(pair_arr).alias("pair"))
                 .groupBy("pair").agg(F.sum("n").alias("cnt"))
                 .orderBy(F.desc("cnt"), F.asc("pair"))
                 .limit(1).collect())
        if not pairs or int(pairs[0]["cnt"]) < min_count:
            break
        a, b = pairs[0]["pair"].split(" ", 1)
        merges.append((a, b))
        # checkpoint per iteration: the fold otherwise nests one HOF
        # per merge and the plan grows quadratically
        vocab = (vocab.withColumn("seq", _fold_merge(F.col("seq"), a, b))
                 .localCheckpoint(eager=True))
    return merges, vocab


def bpe_token_counts(docs_df, vocab_df, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Per-document encoded token count: explode the raw token stream
    and join the word → size(seq) map (the vocabulary covers every
    corpus word by construction). One corpus-wide shuffleless explode
    + a join against the vocabulary-sized map — AQE broadcasts it
    while it fits."""
    from pyspark.sql import functions as F

    lens = vocab_df.select("word", F.size("seq").alias("wlen"))
    words = (docs_df
             .select(id_col, F.explode(tokens_col(F.col(text_col)))
                     .alias("word"))
             .where(F.col("word") != ""))
    return (words.join(lens, "word")
            .groupBy(id_col)
            .agg(F.sum("wlen").cast("long").alias("n_bpe_tokens")))


def bpe_encode_words(words_df, merges, word_col: str = "word",
                     checkpoint_every: int = 8):
    """Encode UNSEEN words with a learned merge list: applies each
    merge in order as the greedy JVM array fold (exactly the trainer's
    fold, so corpus words round-trip to their trained seqs). The plan
    is checkpointed every ``checkpoint_every`` merges — the fold nests
    one HOF per merge and the expression tree otherwise grows
    quadratically. Adds a ``bpe`` array<string> column.

    Scale note: encode the DISTINCT words of a corpus, then join —
    never fold per occurrence."""
    from pyspark.sql import functions as F

    out = words_df.withColumn("bpe", _initial_seq(F.col(word_col)))
    for i, (a, b) in enumerate(merges):
        out = out.withColumn("bpe", _fold_merge(F.col("bpe"), a, b))
        if (i + 1) % int(checkpoint_every) == 0:
            out = out.localCheckpoint(eager=True)
    return out


def encode_word(word: str, merges) -> list:
    """Pure-Python twin of the merge fold (oracle + unit tests):
    encode one word with a learned merge list, in order."""
    seq = list(word) + [EOW]
    for a, b in merges:
        out = []
        for x in seq:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        seq = out
    return seq


def train_bpe_python(word_n: dict, num_merges: int = 32,
                     min_count: int = 2):
    """Pure-Python reference trainer over a {word: count} dict — the
    independent implementation the Spark trainer is checked against
    (and the oracle-literal generator for the contract query)."""
    seqs = {w: list(w) + [EOW] for w in word_n}
    merges = []
    for _i in range(int(num_merges)):
        counts: dict = {}
        for w, seq in seqs.items():
            n = word_n[w]
            for x, y in zip(seq, seq[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + n
        if not counts:
            break
        best = min(counts.items(),
                   key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        (a, b), cnt = best
        if cnt < min_count:
            break
        merges.append((a, b))
        for w in seqs:
            seq, out = seqs[w], []
            for x in seq:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            seqs[w] = out
    return merges, seqs
