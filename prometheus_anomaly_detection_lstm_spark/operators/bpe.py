"""Distributed BPE tokenizer induction (byte-pair-encoding merges).

The canonical tokenizer-training step of an LLM data pipeline
(Sennrich et al., 2016): start from characters, repeatedly merge the
most frequent adjacent symbol pair.  Engine-completeness work — the
reference (vpuhoff/prometheus-anomaly-detection-lstm) has no text surface.

Spark-first shape:

- The corpus collapses to a WORD-FREQUENCY table first (classic BPE
  operates on the word dict, not raw text): one corpus scan, then every
  iteration works on vocabulary-scale data — at 100 TB the word table
  is millions of rows, not billions of tokens.
- Per iteration: adjacent-pair counts are one explode + keyed aggregate
  (weighted by word count); the argmax pair — ONE row — comes to the
  driver (the same driver-side-scalar class as ml/train.py, allowlisted
  by design: BPE's merge choice is inherently sequential); the merge is
  applied with a Catalyst ``aggregate()`` fold over the token arrays —
  leftmost, non-overlapping, no re-merge within the pass, and NO Python
  UDF anywhere.
- Ties break deterministically (count desc, pair lexical asc), so the
  learned merge table is reproducible across partitionings and engines.

``learn_bpe_merges`` has no SQL twin (iterative argmax); it is a
rows-only registry entry pinned against a from-scratch Python BPE
reference in tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_tables import load_table

QUERIES: dict = {}

#: merges learned by the registered query (bounded for grading; the
#: operator takes any count).
N_MERGES = 8
#: words longer than this are dropped from the dict (fold-cost bound;
#: real tokenizers do the same to cap pathological tokens).
MAX_WORD_CHARS = 20


def _word_stream(docs: DataFrame, *extra_cols: str) -> DataFrame:
    """(*extra_cols, word): THE tokenization contract (lowercase,
    whitespace split, 1..MAX_WORD_CHARS) — shared by the trainer and
    the encoder so the merges always apply to the same token stream."""
    return docs.select(
        *extra_cols,
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word"),
    ).filter(
        (F.length("word") > 0) & (F.length("word") <= MAX_WORD_CHARS)
    )


def word_counts(docs: DataFrame) -> DataFrame:
    """corpus -> (t: array<string> of chars, cnt) word-frequency table."""
    words = _word_stream(docs)
    return words.groupBy("word").agg(F.count("*").alias("cnt")).select(
        F.split("word", "").alias("t"), "cnt"
    )


def _pair_counts(wc: DataFrame) -> DataFrame:
    """(a, b, n): adjacent-pair frequencies weighted by word count."""
    zipped = F.arrays_zip(
        F.expr("slice(t, 1, size(t) - 1)"),
        F.expr("slice(t, 2, size(t) - 1)"),
    )
    return (
        wc.filter(F.size("t") >= 2)
        .select("cnt", F.explode(zipped).alias("p"))
        .groupBy(F.col("p.0").alias("a"), F.col("p.1").alias("b"))
        .agg(F.sum("cnt").alias("n"))
    )


#: Catalyst fold applying one merge (__l, __r) -> __l || __r over a
#: token array: leftmost, non-overlapping (a just-merged token is never
#: the left side of another merge in the same pass).
_MERGE_FOLD = """aggregate(
  t, cast(array() as array<string>),
  (acc, x) -> if(
    size(acc) > 0 AND element_at(acc, -1) = __l AND x = __r,
    concat(slice(acc, 1, size(acc) - 1), array(concat(__l, __r))),
    concat(acc, array(x))))"""


def merge_once(wc: DataFrame, left: str, right: str) -> DataFrame:
    """Apply one learned merge to the word table (map-only)."""
    return wc.withColumn("__l", F.lit(left)).withColumn(
        "__r", F.lit(right)
    ).select(F.expr(_MERGE_FOLD).alias("t"), "cnt")


def learn_bpe_merges(
    spark: SparkSession, docs: DataFrame, n_merges: int = N_MERGES
) -> DataFrame:
    """Learn the top-``n_merges`` BPE merge table.  Returns a frame
    (rank, left, right, merged, pair_count) — vocabulary-scale by
    nature (the distributed work is the per-iteration pair count over
    the word table)."""
    wc = word_counts(docs).persist()
    wc.count()  # materialize once; iterations reuse the cache
    merges = []
    try:
        for rank in range(1, n_merges + 1):
            top = (
                _pair_counts(wc)
                .orderBy(F.desc("n"), "a", "b")
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
            merges.append((rank, a, b, a + b, n))
            nxt = merge_once(wc, a, b).persist()
            nxt.count()
            wc.unpersist()
            wc = nxt
    finally:
        wc.unpersist()
    return spark.createDataFrame(
        merges, "rank int, left string, right string,"
        " merged string, pair_count long"
    )


def encode_token_counts(
    docs: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Apply a learned merge list to the corpus: per document, the BPE
    token count before/after — map-only (one chained Catalyst fold per
    merge, rank order), no shuffle at any corpus size."""
    words = _word_stream(docs, "doc_id")
    toks = words.select("doc_id", F.split("word", "").alias("t"))
    for left, right in merges:
        toks = toks.withColumn("__l", F.lit(left)).withColumn(
            "__r", F.lit(right)
        ).select("doc_id", F.expr(_MERGE_FOLD).alias("t"))
    return toks.groupBy("doc_id").agg(
        F.sum(F.size("t")).alias("n_bpe_tokens"),
        F.sum(F.aggregate("t", F.lit(0), lambda acc, x: acc + F.length(x))).alias(
            "n_chars_tokenized"
        ),
    )


def q_vocab_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return learn_bpe_merges(spark, load_table(spark, sf_dir, "documents"))


# Iterative argmax: no SQL twin -> rows-only driver check; exactness is
# pinned against a from-scratch Python BPE in tests/test_bpe.py.
QUERIES["vocab_bpe_merges"] = (q_vocab_bpe_merges, None)
