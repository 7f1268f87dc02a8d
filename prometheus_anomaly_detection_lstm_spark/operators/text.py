"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting — all pure
Catalyst string/array expressions (codegen'd, no Python), each with a
DuckDB oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import single_partition_key
from ..io_tables import load_table
from ..io_tables import parallelize_if_underpartitioned
from ..functions.checkpoint import cut_lineage

#: tiny per-language stopword lists for the n-gram/stopword heuristic.
LANG_STOPWORDS = {
    "en": ["the", "a", "and", "of"],
    "de": ["der", "und", "die", "das"],
    "es": ["el", "la", "los", "que"],
    "fr": ["le", "la", "les", "et"],
}
#: BPE-ish token pattern: word pieces, digits, punctuation runs.
TOKEN_RE = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]+"
QUALITY_STOPWORDS = ["the", "a", "and", "of", "in"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens): whitespace + regex tokens."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_bpe_tokens"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + score.

    score = 0.4·min(n_words/100, 1) + 0.3·(1 − punct_ratio)
          + 0.3·min(stopword_ratio·5, 1)  — a deterministic blend of the
    standard quality signals (length, punctuation density, stopword
    density) used to filter web-scraped corpora.
    """
    words = F.split(F.col("text"), " ")
    sw = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    n_words = F.size(words).cast("double")
    n_chars = F.length("text").cast("double")
    n_punct = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[^a-zA-Z0-9\\s]"), F.lit(0))
    ).cast("double")
    n_stop = F.expr(f"size(filter(split(text, ' '), w -> w IN ({sw})))").cast(
        "double"
    )
    # nullif: an EMPTY document (routine in web scrapes) has 0 chars —
    # ANSI Spark would abort the job on 0/0 where DuckDB's oracle
    # yields NULL; NULL ratios/score mean "unscorable", and the quality
    # filters drop such docs via the failed comparison.  (n_words needs
    # no guard: split('', ' ') = [''] so size >= 1.)
    punct_ratio = n_punct / F.nullif(n_chars, F.lit(0.0))
    stop_ratio = n_stop / n_words
    score = (
        F.least(n_words / 100.0, F.lit(1.0)) * 0.4
        + (F.lit(1.0) - punct_ratio) * 0.3
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
    )
    return docs.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-hit language heuristic: most-hit language wins, 'und'
    (undetermined) when no list hits; deterministic tie-break by
    language code order."""
    words = F.split(F.col("text"), " ")
    hit_cols = []
    for lang, stops in sorted(LANG_STOPWORDS.items()):
        sw = ", ".join(f"'{w}'" for w in stops)
        hit_cols.append(
            F.expr(f"size(filter(split(text, ' '), w -> w IN ({sw})))").alias(
                f"hits_{lang}"
            )
        )
    scored = docs.select("doc_id", *hit_cols)
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier languages win ties
        pred = F.when(
            (F.col(f"hits_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.select(
        "doc_id",
        *[F.col(f"hits_{lang}").cast("bigint") for lang in langs],
        pred.alias("pred_lang"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase text."""
    norm = F.lower(F.regexp_replace(F.col("text"), "\\s+", " "))
    return docs.select(
        "doc_id",
        F.md5(norm.cast("binary")).alias("fingerprint"),
        F.length(norm).cast("bigint").alias("norm_len"),
    )


#: winnowing parameters: k-char grams, min over w-gram sliding windows
WINNOW_K = 5
WINNOW_W = 4
#: whitespace-normalized lowercase text as a SQL fragment
_NORM_SQL = "lower(regexp_replace(text, '\\\\s+', ' '))"


def winnowing_fingerprints(
    docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """Rolling-hash document fingerprints (winnowing, Schleimer et al.).

    The MOSS scheme: hash every k-char gram of the normalized text,
    slide a w-gram window and keep each window's MINIMUM hash; the
    distinct minima are the document's fingerprint set — robust to
    insertions/reordering, the basis of plagiarism/near-dup detection.
    "Hash" = md5 hex (lexicographic min == numeric min on a random
    oracle, identical across engines).  All array expressions, one map
    stage; output the compact per-doc summary (count + extremal
    fingerprints) so the result is hash-comparable.
    """
    with_hashes = (
        docs
        # Docs shorter than k chars (normalized) have no k-grams at all;
        # without this guard sequence(1, L-k+1) runs DESCENDING for L<k
        # and fabricates 6-L bogus hashes that pass the size>=w filter.
        .filter(F.expr(f"length({_NORM_SQL}) >= {k}"))
        .select(
            "doc_id",
            F.expr(
                f"transform(sequence(1, length({_NORM_SQL}) - {k} + 1), "
                f"i -> md5(cast(substring({_NORM_SQL}, i, {k}) AS BINARY)))"
            ).alias("__hs"),
        )
        .filter(F.size("__hs") >= w)
    )
    fps = F.array_distinct(
        F.expr(
            f"transform(sequence(1, size(__hs) - {w} + 1), "
            f"j -> array_min(slice(__hs, j, {w})))"
        )
    )
    return with_hashes.select(
        "doc_id",
        fps.alias("__fps"),
    ).select(
        "doc_id",
        F.size("__fps").cast("bigint").alias("n_fingerprints"),
        F.array_min("__fps").alias("min_fp"),
        F.array_max("__fps").alias("max_fp"),
    )


#: PII patterns kept to Java-regex/RE2 common ground (no backrefs,
#: no lookaround) so Spark and DuckDB replace identically.
PII_PATTERNS = [
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "[IP]"),
    ("phone", "\\+?[0-9][0-9()\\- ]{7,}[0-9]", "[PHONE]"),
]


def pii_redact(docs: DataFrame) -> DataFrame:
    """Corpus cleaning: redact email/IP/phone spans, count each kind.

    (doc_id, n_email, n_ip, n_phone, clean_text) — the standard
    pre-training scrub, pure ``regexp_replace``/``regexp_extract_all``
    (codegen'd; order matters: emails first so their digits never
    half-match the phone pattern).
    """
    out = docs.select(
        "doc_id",
        F.col("text").alias("clean_text"),
        *[
            F.size(
                F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0))
            ).cast("bigint").alias(f"n_{name}")
            for name, pat, _ in PII_PATTERNS
        ],
    )
    for _, pat, repl in PII_PATTERNS:
        out = out.withColumn(
            "clean_text", F.regexp_replace("clean_text", pat, repl)
        )
    return out.select(
        "doc_id", "n_email", "n_ip", "n_phone", "clean_text"
    )


def tfidf_top_terms(
    docs: DataFrame, top_k: int = 3, broadcast_idf: bool | None = None
) -> DataFrame:
    """Top-k TF-IDF terms per document (deterministic tie-break by term).

    tf = term count in doc; idf = ln(N / df).  The foundational
    relevance/feature-weighting operator: explode -> two keyed aggs ->
    idf join -> per-doc top-k window.

    ``broadcast_idf`` picks the idf strategy: ``None`` (default)
    computes df as a count window over the tf stream partitioned by
    term — ONE pass, no separate vocabulary aggregate, no join at all.
    The aggregate+join form makes tf a two-consumer subtree that
    Catalyst executes twice (scan+explode+agg per consumer — round-11
    measured finding, same class as the feature-hashing fix), and its
    broadcast variant additionally bets the executor heap on the
    vocabulary fitting in memory, which a 100-TB web corpus does not
    guarantee.  ``True`` forces the legacy broadcast-join form (right
    when the caller KNOWS the vocab is small); ``False`` forces the
    shuffle sort-merge join form — both kept as explicit overrides and
    as the size-gate teaching example (tests/test_plan_shapes.py).
    """
    words = parallelize_if_underpartitioned(docs, "doc_id").select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # the corpus doc count is ONE row — broadcast it onto the per-term
    # frame (the old form cross-joined it against a distinct() of the
    # whole vocabulary and re-joined: two extra vocabulary-wide
    # exchanges for the same scalar)
    n_docs = docs.select(F.countDistinct("doc_id").alias("n"))
    from pyspark.sql import Window as W

    if broadcast_idf is None:
        # (doc_id, term) rows are distinct post-agg, so the per-term
        # row count IS countDistinct(doc_id)
        scored = (
            tf.withColumn("df", F.count("*").over(W.partitionBy("term")))
            .crossJoin(F.broadcast(n_docs))
            .withColumn("idf", F.log(F.col("n") / F.col("df")))
            .withColumn("tfidf", F.col("tf") * F.col("idf"))
        )
    else:
        df_counts = tf.groupBy("term").agg(
            F.countDistinct("doc_id").alias("df")
        )
        idf = (
            df_counts.crossJoin(F.broadcast(n_docs))
            .select("term", F.log(F.col("n") / F.col("df")).alias("idf"))
        )
        idf_side = F.broadcast(idf) if broadcast_idf else idf.hint("merge")
        scored = tf.join(idf_side, "term").withColumn(
            "tfidf", F.col("tf") * F.col("idf")
        )

    w = W.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= top_k)
        .select(
            "doc_id", "term", "tf", F.round("tfidf", 6).alias("tfidf"), "rk"
        )
    )


ORACLE_TFIDF = """WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM words GROUP BY 1, 2),
dfc AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, tf.tf * ln(n.n * 1.0 / dfc.df) AS tfidf
  FROM tf JOIN dfc USING (term), n
),
ranked AS (
  SELECT doc_id, term, tf, tfidf,
         CAST(row_number() OVER (PARTITION BY doc_id
              ORDER BY tfidf DESC, term ASC) AS BIGINT) AS rk
  FROM scored
)
SELECT doc_id, term, tf, round(tfidf, 6) AS tfidf, rk
FROM ranked WHERE rk <= 3"""


# ------------------------------------------------------------- oracles

ORACLE_TOKEN_COUNTS = f"""SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_bpe_tokens
FROM documents"""

_SW = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)

ORACLE_QUALITY_SCORES = f"""WITH f AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE) AS n_punct,
         CAST(len(list_filter(string_split(text, ' '), w -> w IN ({_SW}))) AS DOUBLE) AS n_stop
  FROM documents
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       round(n_punct / n_chars, 6) AS punct_ratio,
       round(n_stop / n_words, 6) AS stopword_ratio,
       round(least(n_words / 100.0, 1.0) * 0.4
             + (1.0 - n_punct / n_chars) * 0.3
             + least(n_stop / n_words * 5.0, 1.0) * 0.3, 6) AS quality_score
FROM f"""


def _lang_id_sql() -> str:
    langs = sorted(LANG_STOPWORDS)
    hits = ",\n         ".join(
        "CAST(len(list_filter(string_split(text, ' '), w -> w IN ({}))) AS BIGINT) AS hits_{}".format(
            ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang]), lang
        )
        for lang in langs
    )
    best = "greatest({})".format(", ".join(f"hits_{lang}" for lang in langs))
    case = "CASE "
    for lang in langs:
        case += f"WHEN hits_{lang} = best AND best > 0 THEN '{lang}' "
    case += "ELSE 'und' END"
    return f"""WITH h AS (
  SELECT doc_id,
         {hits}
  FROM documents
),
b AS (SELECT *, {best} AS best FROM h)
SELECT doc_id, {', '.join(f'hits_{lang}' for lang in langs)}, {case} AS pred_lang
FROM b"""


ORACLE_LANG_ID = _lang_id_sql()

ORACLE_WINNOWING = f"""WITH n AS (
  SELECT doc_id, lower(regexp_replace(text, '\\s+', ' ', 'g')) AS norm
  FROM documents
),
hs AS (
  SELECT doc_id,
         list_transform(generate_series(1, length(norm) - {WINNOW_K} + 1),
                        i -> md5(substr(norm, i, {WINNOW_K}))) AS hl
  FROM n WHERE length(norm) >= {WINNOW_K}
),
fp AS (
  SELECT doc_id,
         list_distinct(
           list_transform(generate_series(1, len(hl) - {WINNOW_W} + 1),
                          j -> list_min(hl[j:j + {WINNOW_W} - 1]))) AS fps
  FROM hs WHERE len(hl) >= {WINNOW_W}
)
SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fingerprints,
       list_min(fps) AS min_fp, list_max(fps) AS max_fp
FROM fp"""

def _pii_sql() -> str:
    counts = ",\n       ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    clean = "text"
    for _, pat, repl in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    return f"""SELECT doc_id,
       {counts},
       {clean} AS clean_text
FROM documents"""


def repetition_scores(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per document.

    (doc_id, n_words, top_word_frac, dup_2gram_frac): the fraction of
    the doc taken by its most frequent word, and the duplicate fraction
    of word 2-grams (1 - distinct/total).  The standard repetition
    filters for web-scale pretraining corpora — docs dominated by one
    token or by repeated phrases are boilerplate/spam.  Two keyed
    aggregations over the exploded word/2-gram streams; everything
    map-side partial first, shuffles carry one row per (doc, word).
    """
    docs = parallelize_if_underpartitioned(docs, "doc_id")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    wc = (
        words.groupBy("doc_id", "word")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_words"),
            F.max("cnt").alias("top_cnt"),
        )
    )
    # docs was gated once above; both branches hang off the SAME
    # repartition subtree so ReuseExchange dedupes the fan-out shuffle.
    grams = (
        docs.withColumn("ws", F.split("text", " "))
        .filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(F.expr("sequence(1, size(ws) - 1)")).alias("i"),
            "ws",
        )
        .select(
            "doc_id",
            F.expr("concat_ws(' ', slice(ws, i, 2))").alias("g2"),
        )
    )
    gc = grams.groupBy("doc_id").agg(
        F.count("*").alias("n_g"),
        F.countDistinct("g2").alias("n_dg"),
    )
    return (
        wc.join(gc, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_words").cast("bigint").alias("n_words"),
            F.round(F.col("top_cnt") / F.col("n_words"), 6).alias(
                "top_word_frac"
            ),
            F.round(
                F.coalesce(
                    F.lit(1.0) - F.col("n_dg") / F.col("n_g"), F.lit(0.0)
                ),
                6,
            ).alias("dup_2gram_frac"),
        )
    )


ORACLE_REPETITION = """WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
wc AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_words, max(cnt) AS top_cnt
  FROM (SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY 1, 2)
  GROUP BY 1
),
g AS (
  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS g2
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       unnest(generate_series(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 2
),
gc AS (
  SELECT doc_id, count(*) AS n_g, count(DISTINCT g2) AS n_dg
  FROM g GROUP BY 1
)
SELECT wc.doc_id, n_words,
       round(top_cnt * 1.0 / n_words, 6) AS top_word_frac,
       round(coalesce(1.0 - n_dg * 1.0 / n_g, 0.0), 6) AS dup_2gram_frac
FROM wc LEFT JOIN gc ON gc.doc_id = wc.doc_id"""


#: C4-style hard filter rules: (name, SQL predicate over a doc row with
#: helper columns n_words / max_word_len).  A doc is kept iff every
#: rule passes; fail_reasons lists the violated rule names in order.
QUALITY_FILTER_MIN_WORDS = 10
QUALITY_FILTER_MAX_WORD_LEN = 20


def quality_checks() -> list[tuple[str, "F.Column"]]:
    """The C4-style rule set as (name, boolean Column) pairs over a doc
    row — shared by quality_filter and the composed clean-corpus
    pipeline (corpus.clean_corpus_summary) so the two can never drift."""
    words = F.split(F.col("text"), " ")
    max_word_len = F.array_max(F.transform(words, F.length))
    return [
        ("min_words", F.size(words) >= QUALITY_FILTER_MIN_WORDS),
        ("max_word_len", max_word_len <= QUALITY_FILTER_MAX_WORD_LEN),
        ("no_lorem", ~F.lower(F.col("text")).contains("lorem ipsum")),
        ("no_braces", ~F.col("text").contains("{")),
    ]


def quality_filter(docs: DataFrame) -> DataFrame:
    """C4-style hard document filter: keep bit + failure reasons.

    Rules (the classic web-corpus cleaning set, applied as pure
    column expressions — one map stage, no shuffle):
      min_words     >= 10 whitespace tokens
      max_word_len  no token longer than 20 chars (URL/base64 junk)
      no_lorem      no 'lorem ipsum' boilerplate
      no_braces     no '{' (code/markup leakage into prose corpora)
    """
    checks = quality_checks()
    fails = F.concat_ws(
        ",",
        F.array_compact(
            F.array(
                *[F.when(~ok, F.lit(name)) for name, ok in checks]
            )
        ),
    )
    keep = reduce(lambda a, b: a & b, [ok for _, ok in checks])
    return docs.select(
        "doc_id",
        keep.cast("bigint").alias("keep"),
        fails.alias("fail_reasons"),
    )


ORACLE_QUALITY_FILTER = f"""WITH f AS (
  SELECT doc_id,
         len(string_split(text, ' ')) >= {QUALITY_FILTER_MIN_WORDS} AS ok_min_words,
         list_max(list_transform(string_split(text, ' '), w -> length(w)))
           <= {QUALITY_FILTER_MAX_WORD_LEN} AS ok_word_len,
         NOT contains(lower(text), 'lorem ipsum') AS ok_lorem,
         NOT contains(text, '{{') AS ok_braces
  FROM documents
)
SELECT doc_id,
       CAST(ok_min_words AND ok_word_len AND ok_lorem AND ok_braces AS BIGINT) AS keep,
       coalesce(array_to_string(list_filter([
         CASE WHEN NOT ok_min_words THEN 'min_words' END,
         CASE WHEN NOT ok_word_len THEN 'max_word_len' END,
         CASE WHEN NOT ok_lorem THEN 'no_lorem' END,
         CASE WHEN NOT ok_braces THEN 'no_braces' END
       ], x -> x IS NOT NULL), ','), '') AS fail_reasons
FROM f"""


ORACLE_PII_REDACT = _pii_sql()

ORACLE_FINGERPRINTS = """WITH n AS (
  SELECT doc_id, lower(regexp_replace(text, '\\s+', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id, md5(norm) AS fingerprint,
       CAST(length(norm) AS BIGINT) AS norm_len
FROM n"""


# ------------------------------------------------------------- registry

def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_counts(_docs(spark, sf_dir))


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_scores(_docs(spark, sf_dir))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(_docs(spark, sf_dir))


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprints(_docs(spark, sf_dir))


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_top_terms(_docs(spark, sf_dir))


def q_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnowing_fingerprints(_docs(spark, sf_dir))


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pii_redact(_docs(spark, sf_dir))


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_scores(_docs(spark, sf_dir))


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_filter(_docs(spark, sf_dir))


#: duplicate-span n-gram width (words) for dup_ngram_spans
DUP_NGRAM_N = 8


def trigram_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, tri): lowercase character-trigram stream — the shared
    feed of the LM/perplexity/lang-id family.  Positions explode FIRST
    and the substring evaluates per exploded row inside whole-stage
    codegen: building the trigram array inside transform() (and
    re-lowering the text per element) measured 2.5x slower at sf0.1
    (round 8).  The doc frame is rebalanced when the source
    under-splits (parallelize_if_underpartitioned: single-row-group
    local files would otherwise pipeline the whole explode through one
    core; exact no-op at scale)."""
    return (
        parallelize_if_underpartitioned(docs, "doc_id").select("doc_id", F.lower("text").alias("__lt"))
        .where(F.length("__lt") >= 3)
        .select(
            "doc_id",
            "__lt",
            F.explode(F.expr("sequence(1, length(__lt) - 2)")).alias("__i"),
        )
        .select("doc_id", F.expr("substring(__lt, __i, 3)").alias("tri"))
    )


def _gram_stream(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, s, e, ngram): every n-word span with its 1-based word
    range.  Positions explode first; the span text assembles per
    exploded row inside whole-stage codegen (the fast shape — see
    dup_ngram_spans docstring).  Rebalanced before the fan-out when the
    source under-splits (see parallelize_if_underpartitioned)."""
    words = F.split(F.col("text"), " ")
    return (
        parallelize_if_underpartitioned(docs, "doc_id").select("doc_id", words.alias("__ws"))
        .where(F.size("__ws") >= n)
        .select(
            "doc_id",
            "__ws",
            F.explode(
                F.sequence(F.lit(1), F.size("__ws") - (n - 1))
            ).alias("s"),
        )
        .select(
            "doc_id",
            "s",
            (F.col("s") + (n - 1)).alias("e"),
            F.concat_ws(
                " ", F.slice("__ws", F.col("s"), n)
            ).alias("ngram"),
        )
    )


def dup_ngram_spans(docs: DataFrame, n: int = DUP_NGRAM_N) -> DataFrame:
    """Exact duplicate-substring mining at n-gram granularity: every
    n-word span that occurs in MORE THAN ONE document, with corpus
    counts — the discovery pass of exact-substring dedup ("Deduplicating
    Training Data Makes Language Models Better"-style pipelines; the
    reference has no text surface at all, SURVEY §2).

    Shape: per-doc n-gram generation is a single JVM projection
    (split -> sequence -> explode -> per-row slice/concat, no Python);
    the explode fans out ~n_words rows per doc — the same factor a
    shingle pass costs — and the only shuffle is the keyed agg on the
    span text.  The position sequence explodes FIRST and the span text
    assembles per exploded row: building an array-of-ngrams inside
    transform() materializes every span per doc before the explode and
    measured 7.7x slower at sf0.1 (round 8).  Output is self-limiting
    (spans with cross-doc support >= 2), so at 100 TB the result stays
    proportional to the duplicated volume, not the corpus.  Docs
    shorter than n words are excluded BEFORE sequence() so the
    descending-sequence trap (r2 ADVICE on winnowing) can't produce
    bogus spans.
    """
    spans = _gram_stream(docs, n).select("doc_id", "ngram")
    return (
        spans.groupBy("ngram")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )


ORACLE_DUP_NGRAM_SPANS = f"""WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
  WHERE len(string_split(text, ' ')) >= {DUP_NGRAM_N}
), g AS (
  SELECT doc_id,
         array_to_string(words[i:i + {DUP_NGRAM_N - 1}], ' ') AS ngram
  FROM w, unnest(generate_series(1, len(words) - {DUP_NGRAM_N - 1})) t(i)
)
SELECT ngram, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences
FROM g GROUP BY ngram HAVING count(DISTINCT doc_id) >= 2"""


def q_dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup_ngram_spans(_docs(spark, sf_dir))


QUERIES = {
    "text_token_counts": (q_token_counts, ORACLE_TOKEN_COUNTS),
    "text_quality_scores": (q_quality_scores, ORACLE_QUALITY_SCORES),
    "text_lang_id": (q_lang_id, ORACLE_LANG_ID),
    "text_fingerprints": (q_fingerprints, ORACLE_FINGERPRINTS),
    "text_winnowing_fingerprints": (q_winnowing, ORACLE_WINNOWING),
    "text_pii_redact": (q_pii_redact, ORACLE_PII_REDACT),
    "text_tfidf_top_terms": (q_tfidf, ORACLE_TFIDF),
    "text_repetition_scores": (q_repetition, ORACLE_REPETITION),
    "text_quality_filter": (q_quality_filter, ORACLE_QUALITY_FILTER),
    "text_dup_ngram_spans": (q_dup_ngram_spans, ORACLE_DUP_NGRAM_SPANS),
}


# ------------------------------------------------------------------
# Character-trigram LM scoring (perplexity-proxy quality signal)

def lm_trigram_scores(docs: DataFrame) -> DataFrame:
    """Corpus-trained character-trigram LM score per document.

    The cheap perplexity proxy of CCNet/Gopher-style quality filtering
    (they score with a pretrained KenLM; same shape, with the LM
    trained on the corpus itself): global trigram frequencies are the
    model, and each doc scores

        avg over its trigrams of  ln( count(tri) / total_trigrams )

    Common text scores high (close to the corpus distribution);
    rare-garbage scores very low.  Output: (doc_id, n_tris, lm_score).

    Shape: trigram explode is one map stage; counts are a keyed agg on
    the trigram (vocabulary bounded by charset³ — bounded keys, no
    skew cliff); the score join back to the trigram stream is unhinted
    so AQE broadcasts the count table while it fits and shuffle-joins
    beyond; the per-doc mean reuses doc_id keying.  All JVM-side.
    """
    tris = trigram_stream(docs)
    counts = tris.groupBy("tri").agg(F.count("*").alias("c"))
    total = counts.agg(F.sum("c").alias("total"))
    return (
        tris.join(counts, "tri")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tris"),
            F.round(F.avg(F.log(F.col("c") / F.col("total"))), 6).alias(
                "lm_score"
            ),
        )
    )


ORACLE_LM_TRIGRAM = """WITH tris AS (
  SELECT doc_id,
         substring(lower(text), i, 3) AS tri
  FROM documents, unnest(generate_series(1, length(lower(text)) - 2)) t(i)
  WHERE length(lower(text)) >= 3
), counts AS (
  SELECT tri, count(*) AS c FROM tris GROUP BY tri
), total AS (
  SELECT sum(c) AS total FROM counts
)
SELECT doc_id, count(*) AS n_tris,
       round(avg(ln(c / total)), 6) AS lm_score
FROM tris JOIN counts USING (tri) CROSS JOIN total
GROUP BY doc_id"""


def q_lm_trigram_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lm_trigram_scores(_docs(spark, sf_dir))


QUERIES["text_lm_trigram_scores"] = (q_lm_trigram_scores, ORACLE_LM_TRIGRAM)


# ----------------------------------------------------- frequent tokens

#: minimum global share for a token to count as a heavy hitter.
HH_SUPPORT = 0.001


def _local_heavy_hitters(support: float):
    """mapInPandas kernel: exact per-partition token counts, emitting
    tokens whose LOCAL share reaches ``support``.

    Pigeonhole guarantee: freq(x) >= s * N globally implies some
    partition has freq_p(x) >= s * n_p, so the union of local emissions
    is a SUPERSET of the true heavy hitters under ANY partitioning —
    the exact recount pass then makes the final set partitioning-
    independent.  Memory is the per-partition vocabulary; a
    Space-Saving table (capacity 1/s, evict-min) is the bounded-memory
    drop-in if per-partition vocab ever exceeds RAM — same guarantee,
    same interface.
    """

    def gen(batches):
        import pandas as pd

        counts: dict = {}
        n = 0
        for pdf in batches:
            vc = pdf["token"].value_counts()
            n += int(vc.sum())
            for tok, c in vc.items():
                counts[tok] = counts.get(tok, 0) + int(c)
        cut = support * n
        cands = [t for t, c in counts.items() if c >= cut]
        yield pd.DataFrame({"token": pd.Series(cands, dtype="object")})

    return gen


def frequent_tokens(
    docs: DataFrame, support: float = HH_SUPPORT
) -> DataFrame:
    """Exact corpus heavy hitters: tokens with share >= ``support``.

    Two passes, neither shuffling the raw token stream by token:
    (1) sketch pass — one map-side scan emits per-partition candidate
    tokens (superset guarantee above, at most 1/support per partition);
    (2) verify pass — exact counts restricted to the candidate set via
    an equi-join, thresholded against the exact global token count.
    The full token->count shuffle of the naive groupBy never happens;
    what shuffles is the candidate list and the candidate-only counts.
    Output: (token, cnt, share), identical to the one-shot SQL twin.
    """
    tokens = parallelize_if_underpartitioned(docs, "doc_id").select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    )
    cands = (
        tokens.mapInPandas(_local_heavy_hitters(support), "token string")
        .distinct()
    )
    total = tokens.agg(F.count("*").alias("__total"))
    return (
        tokens.join(cands, "token")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.lit(support) * F.col("__total"))
        .select(
            "token",
            "cnt",
            F.round(F.col("cnt") / F.col("__total"), 6).alias("share"),
        )
    )


ORACLE_FREQUENT_TOKENS = f"""WITH t AS (
  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
), n AS (
  SELECT count(*) AS total FROM t
)
SELECT token, CAST(count(*) AS BIGINT) AS cnt,
       round(count(*) / (SELECT total FROM n), 6) AS share
FROM t
GROUP BY token
HAVING count(*) >= {HH_SUPPORT} * (SELECT total FROM n)"""


def q_frequent_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frequent_tokens(_docs(spark, sf_dir))


QUERIES["text_frequent_tokens"] = (q_frequent_tokens, ORACLE_FREQUENT_TOKENS)


# ------------------------------------------------------ n-gram novelty

NOVELTY_N = 5


def ngram_novelty(docs: DataFrame, n: int = NOVELTY_N) -> DataFrame:
    """Per-doc novelty: the fraction of its word ``n``-grams whose FIRST
    corpus occurrence (by doc_id order) is this doc — the contribution
    score dataset-curation pipelines use to rank near-redundant docs
    (a doc whose grams all appeared earlier adds nothing).

    Shape: distinct (doc_id, gram) -> min(doc_id) per gram (one keyed
    agg on the gram — the inverted-index distribution every dedup op
    here shares) -> join back -> per-doc ratio.  Output:
    (doc_id, n_grams, n_novel, novelty) for docs with >= n words.
    """
    ws = F.split(F.col("text"), " ")
    grams = (
        parallelize_if_underpartitioned(docs, "doc_id").withColumn("ws", ws)
        .filter(F.size("ws") >= n)
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(1, size(ws) - {n - 1})")).alias("i"),
            "ws",
        )
        .select(
            "doc_id",
            F.expr(f"concat_ws(' ', slice(ws, i, {n}))").alias("gram"),
        )
        .distinct()
    )
    first = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(first, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_novel"),
        )
        .withColumn(
            "novelty", F.round(F.col("n_novel") / F.col("n_grams"), 6)
        )
    )


ORACLE_NGRAM_NOVELTY = f"""WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
  WHERE len(string_split(text, ' ')) >= {NOVELTY_N}
), grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(ws, i, i + {NOVELTY_N - 1}), ' ') AS gram
  FROM w, unnest(generate_series(1, len(ws) - {NOVELTY_N - 1})) AS t(i)
), first AS (
  SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram
)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN g.doc_id = f.first_doc THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       round(sum(CASE WHEN g.doc_id = f.first_doc THEN 1 ELSE 0 END)
             / count(*), 6) AS novelty
FROM grams g JOIN first f USING (gram)
GROUP BY 1"""


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_novelty(_docs(spark, sf_dir))


QUERIES["text_ngram_novelty"] = (q_ngram_novelty, ORACLE_NGRAM_NOVELTY)


# ------------------------------------------------------------------
# BM25 retrieval (Okapi BM25 top-k over an inverted-index shape)

#: fixed benchmark query: one rare discriminative term + two common
#: ones — exercises the idf spread of the synthetic vocabulary.
BM25_QUERY_TERMS = ["dup", "hash", "scan"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10


def bm25_topk(
    docs: DataFrame,
    terms: list[str] | None = None,
    k: int = BM25_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Okapi BM25 top-k document retrieval for a fixed term set.

    score(D, Q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|D|/avgdl))
    with idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1) (the Lucene/Okapi
    non-negative form).  Output (doc_id, score, rk), rk ≤ k,
    deterministic tie-break by doc_id.

    Scale shape — the inverted-index discipline end-to-end:
    - the token stream is filtered to the QUERY TERMS before any
      shuffle (an IN-list map filter — at 100 TB the posting lists for
      a handful of terms are a vanishing fraction of the corpus);
    - tf is one keyed agg over the filtered postings; df is a
      term-count agg over tf (|terms| rows);
    - N + avgdl come from ONE corpus-level agg (a single row,
      broadcast);
    - the final top-k is a window over scored docs ordered by score —
      candidates are only docs containing ≥1 query term, never the
      corpus.
    No reference counterpart (the reference has no text surface);
    standard Okapi BM25 per Robertson & Zaragoza.
    """
    terms = BM25_QUERY_TERMS if terms is None else terms
    stats = docs.select(
        F.count("*").alias("n_docs"),
        F.avg(F.size(F.split("text", " "))).alias("avgdl"),
    )
    postings = (
        parallelize_if_underpartitioned(docs, "doc_id").select(
            "doc_id",
            F.size(F.split("text", " ")).alias("dl"),
            F.explode(F.split("text", " ")).alias("term"),
        )
        .filter(F.col("term").isin(terms))
    )
    tf = postings.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    # df as a count window over tf (one row per (doc, term), so the
    # per-term row count IS the doc frequency): a separate df
    # aggregate joined back makes tf a two-consumer subtree that
    # Catalyst executes twice — and tf's lineage is the CORPUS
    # scan+explode, so the second consumer re-reads the whole corpus
    # (round-11 measured finding, same class as the tfidf/
    # feature-hashing fixes; scans 3 -> 2, postings themselves are
    # |query terms|-bounded so the window is metadata-scale)
    from pyspark.sql import Window as _W

    scored = (
        tf.withColumn("df", F.count("*").over(_W.partitionBy("term")))
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy(single_partition_key("doc_id")).orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("doc_id", "score", "rk")
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk(_docs(spark, sf_dir))


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)

ORACLE_BM25 = f"""WITH stats AS (
  SELECT count(*) AS n_docs,
         avg(len(string_split(text, ' '))) AS avgdl
  FROM documents
),
postings AS (
  SELECT doc_id, dl, term FROM (
    SELECT doc_id, len(string_split(text, ' ')) AS dl,
           unnest(string_split(text, ' ')) AS term
    FROM documents
  ) WHERE term IN ({_BM25_TERMS_SQL})
),
tf AS (
  SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
  FROM postings GROUP BY doc_id, term
),
idf AS (
  SELECT term, ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf,
         avgdl
  FROM (SELECT term, count(*) AS df FROM tf GROUP BY term), stats
),
scored AS (
  SELECT doc_id,
         round(sum(idf * (tf * ({BM25_K1} + 1.0)) /
                   (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))), 6)
           AS score
  FROM tf JOIN idf USING (term)
  GROUP BY doc_id
)
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rk
FROM scored QUALIFY rk <= {BM25_TOP_K}"""

QUERIES["text_bm25_topk"] = (q_bm25_topk, ORACLE_BM25)


# ------------------------------------------------------------------
# Multinomial Naive Bayes classifier (train + score in one DAG)

#: held-out fold: doc_id % NB_FOLD_MOD == 0 scores, the rest trains.
NB_FOLD_MOD = 5
NB_POS_LANG = "en"


def nb_train_score(docs: DataFrame, pos_lang: str = NB_POS_LANG) -> DataFrame:
    """Multinomial Naive Bayes language classifier — the classic
    fasttext-shaped quality/label classifier of LLM data pipelines
    (CCNet, GPT-3 quality filtering), trained AND applied in one
    Catalyst DAG.

    Labels are intrinsic (``lang == pos_lang``); docs with
    ``doc_id % NB_FOLD_MOD != 0`` train, the rest are scored held-out.
    Laplace-smoothed per-token log-likelihood ratios; unseen tokens
    contribute the smoothed-only ratio ln((tot_neg+V)/(tot_pos+V)).
    Output (doc_id, nb_score, pred_pos, is_pos) for the held-out fold.

    Scale shape — the model is VOCABULARY-scale, the data is not:
    - one keyed agg over the train token stream builds per-term class
      counts; totals and priors are single-row aggs (broadcast);
    - the model table broadcasts into the held-out token stream
      (at 100 TB the vocabulary is MBs while the corpus is TBs — the
      same inverted-index discipline as BM25/TF-IDF here);
    - scoring is one keyed agg per held-out doc.  No global sort, no
      iteration, nothing corpus-scale ever sits on the driver.
    No reference counterpart (the reference has no text surface).
    """
    is_pos = (F.col("lang") == pos_lang).cast("bigint")
    toks = parallelize_if_underpartitioned(docs, "doc_id").select(
        "doc_id",
        is_pos.alias("is_pos"),
        F.explode(F.split("text", " ")).alias("term"),
    ).filter(F.col("term") != "")
    train_toks = toks.filter(F.col("doc_id") % NB_FOLD_MOD != 0)

    # counts is VOCABULARY-scale with two consumers (stats, model) and
    # the model itself is consumed downstream — unchecked, Catalyst
    # re-executed the corpus-wide token agg per consumer (6 executed
    # scans, round-12 audit).  Checkpointing the vocab-scale counts
    # (+ the one-row stats) cuts that to 3; interleaved full-cost A/B
    # at sf0.1: 1.79 -> 1.57 s median-of-5, hash-identical.  (This is
    # the CHECKPOINT lever — distinct from the round-11 stats REWRITE
    # counter-example, where an ungrouped countDistinct planned a
    # single-partition merge and measured slower.)  Executor-loss
    # caveat: see events_association_rules (relational.py).
    counts = train_toks.groupBy("term").agg(
        F.sum("is_pos").alias("n_pos"),
        (F.count("*") - F.sum("is_pos")).alias("n_neg"),
    ).transform(cut_lineage)
    stats = counts.agg(
        F.sum("n_pos").alias("tot_pos"),
        F.sum("n_neg").alias("tot_neg"),
        F.count("*").alias("vocab"),
    ).transform(cut_lineage)
    model = counts.crossJoin(F.broadcast(stats)).select(
        "term",
        (
            F.log((F.col("n_pos") + 1.0) / (F.col("tot_pos") + F.col("vocab")))
            - F.log((F.col("n_neg") + 1.0) / (F.col("tot_neg") + F.col("vocab")))
        ).alias("llr"),
    )

    test_toks = toks.filter(F.col("doc_id") % NB_FOLD_MOD == 0)
    tok_llr = (
        test_toks.join(F.broadcast(model), "term", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.coalesce(
                F.col("llr"),
                F.log(
                    (F.col("tot_neg") + F.col("vocab"))
                    / (F.col("tot_pos") + F.col("vocab"))
                ),
            ).alias("llr_eff"),
        )
        .groupBy("doc_id")
        .agg(F.sum("llr_eff").alias("tok_llr"))
    )

    train_docs = docs.filter(F.col("doc_id") % NB_FOLD_MOD != 0)
    priors = train_docs.agg(
        F.sum(is_pos).alias("d_pos"),
        (F.count("*") - F.sum(is_pos)).alias("d_neg"),
    )
    test_docs = docs.filter(F.col("doc_id") % NB_FOLD_MOD == 0).select(
        "doc_id", is_pos.alias("is_pos")
    )
    return (
        test_docs.join(tok_llr, "doc_id", "left")
        .crossJoin(F.broadcast(priors))
        .select(
            "doc_id",
            F.round(
                F.log((F.col("d_pos") + 1.0) / (F.col("d_neg") + 1.0))
                + F.coalesce(F.col("tok_llr"), F.lit(0.0)),
                6,
            ).alias("nb_score"),
            "is_pos",
        )
        .withColumn(
            "pred_pos", (F.col("nb_score") > 0).cast("bigint")
        )
        .select("doc_id", "nb_score", "pred_pos", "is_pos")
    )


def q_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nb_train_score(_docs(spark, sf_dir))


_NB_CORE_SQL = f"""toks AS (
  SELECT doc_id, is_pos, term FROM (
    SELECT doc_id,
           CAST(lang = '{NB_POS_LANG}' AS BIGINT) AS is_pos,
           unnest(string_split(text, ' ')) AS term
    FROM documents
  ) WHERE term <> ''
),
counts AS (
  SELECT term, sum(is_pos) AS n_pos, count(*) - sum(is_pos) AS n_neg
  FROM toks WHERE doc_id % {NB_FOLD_MOD} <> 0 GROUP BY term
),
stats AS (
  SELECT sum(n_pos) AS tot_pos, sum(n_neg) AS tot_neg,
         count(*) AS vocab
  FROM counts
),
model AS (
  SELECT term,
         ln((n_pos + 1.0) / (tot_pos + vocab))
           - ln((n_neg + 1.0) / (tot_neg + vocab)) AS llr
  FROM counts, stats
),
tok_llr AS (
  SELECT doc_id,
         sum(coalesce(llr,
             ln((tot_neg + vocab) * 1.0 / (tot_pos + vocab)))) AS tok_llr
  FROM (SELECT * FROM toks WHERE doc_id % {NB_FOLD_MOD} = 0) t
  LEFT JOIN model USING (term)
  CROSS JOIN stats
  GROUP BY doc_id
),
priors AS (
  SELECT sum(CAST(lang = '{NB_POS_LANG}' AS BIGINT)) AS d_pos,
         count(*) - sum(CAST(lang = '{NB_POS_LANG}' AS BIGINT)) AS d_neg
  FROM documents WHERE doc_id % {NB_FOLD_MOD} <> 0
),
scored AS (
  SELECT d.doc_id,
         round(ln((d_pos + 1.0) / (d_neg + 1.0))
               + coalesce(tok_llr, 0.0), 6) AS nb_score,
         CAST(d.lang = '{NB_POS_LANG}' AS BIGINT) AS is_pos
  FROM documents d
  LEFT JOIN tok_llr USING (doc_id)
  CROSS JOIN priors
  WHERE d.doc_id % {NB_FOLD_MOD} = 0
)"""

ORACLE_NB = f"""WITH {_NB_CORE_SQL}
SELECT doc_id, nb_score,
       CAST(nb_score > 0 AS BIGINT) AS pred_pos, is_pos
FROM scored"""

QUERIES["text_nb_classifier"] = (q_nb_classifier, ORACLE_NB)


# ------------------------------------------------------------------
# Binned ROC-AUC evaluation of a score column vs a binary label

#: score quantization for the binned ROC: 2 decimal places.  Exact
#: Mann-Whitney AUC needs a GLOBAL rank of every score — a global sort
#: that serializes at corpus scale.  Binning makes the ranking frame
#: BOUNDED (one row per distinct bin), the standard scale treatment;
#: ties within a bin get the mid-rank credit, so the statistic is the
#: exact tie-aware AUC of the quantized scores.
AUC_BIN_DECIMALS = 2


def score_auc(scored: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Tie-aware binned ROC-AUC: P(score_pos > score_neg) + ½·P(=).

    AUC = Σ_bins n_pos(bin) · (cum_neg_below(bin) + n_neg(bin)/2) / (P·N)
    over ascending score bins — the Mann-Whitney rank-sum with average
    ranks, computed from per-bin counts.  Output one row
    (auc, n_pos, n_neg).

    Scale shape: one keyed agg corpus→bins, then a window over the
    BOUNDED bin frame (metadata-scale single partition, same pattern
    as ``mse_histogram``); never a global sort of the data.
    """
    from pyspark.sql import Window as W

    bins = (
        scored.select(
            F.round(F.col(score_col), AUC_BIN_DECIMALS).alias("bin"),
            F.col(label_col).alias("is_pos"),
        )
        .groupBy("bin")
        .agg(
            F.sum("is_pos").alias("n_pos"),
            (F.count("*") - F.sum("is_pos")).alias("n_neg"),
        )
    )
    w = (
        W.partitionBy(single_partition_key("bin"))
        .orderBy("bin")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ranked = bins.withColumn(
        "cum_neg_below", F.coalesce(F.sum("n_neg").over(w), F.lit(0))
    )
    return ranked.agg(
        F.round(
            F.sum(
                F.col("n_pos")
                * (F.col("cum_neg_below") + F.col("n_neg") / 2.0)
            )
            / F.nullif(
                (F.sum("n_pos") * F.sum("n_neg")).cast("double"), F.lit(0.0)
            ),
            6,
        ).alias("auc"),
        F.sum("n_pos").alias("n_pos"),
        F.sum("n_neg").alias("n_neg"),
    )


def q_nb_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the held-out Naive-Bayes scores vs the true labels."""
    return score_auc(nb_train_score(_docs(spark, sf_dir)), "nb_score", "is_pos")


ORACLE_NB_AUC = f"""WITH {_NB_CORE_SQL},
bins AS (
  SELECT round(nb_score, {AUC_BIN_DECIMALS}) AS bin,
         sum(is_pos) AS n_pos, count(*) - sum(is_pos) AS n_neg
  FROM scored GROUP BY 1
),
ranked AS (
  SELECT n_pos, n_neg,
         coalesce(sum(n_neg) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_neg_below
  FROM bins
)
SELECT round(sum(n_pos * (cum_neg_below + n_neg / 2.0))
             / nullif(CAST(sum(n_pos) * sum(n_neg) AS DOUBLE), 0.0), 6)
         AS auc,
       CAST(sum(n_pos) AS BIGINT) AS n_pos,
       CAST(sum(n_neg) AS BIGINT) AS n_neg
FROM ranked"""

QUERIES["text_nb_classifier_auc"] = (q_nb_classifier_auc, ORACLE_NB_AUC)


#: multiclass NB label universe (the documents table's languages).
NB_LANGS = ["de", "en", "es", "fr", "zh"]


def nb_multiclass_confusion(docs: DataFrame) -> DataFrame:
    """Multiclass multinomial NB language ID + confusion matrix.

    The binary classifier's big sibling: per-(term, lang) Laplace-
    smoothed log-likelihoods, argmax over the label universe for each
    held-out doc (doc_id % NB_FOLD_MOD == 0), rolled into the
    (true_lang, pred_lang, n) confusion matrix — the standard language-
    ID quality report of a corpus pipeline.

    Scale shape: the model pivots per-term class counts into one
    vocabulary-scale row per term (5 columns), broadcast-joined into
    the held-out token stream; per-doc scores are one keyed agg; the
    confusion rollup is label-universe-scale.  Unseen terms fall back
    to the smoothed-only likelihood via the left join's NULL->0.
    Argmax ties break toward the lexicographically LAST language
    (struct max over (score, lang)) identically in the SQL twin.
    """
    toks = parallelize_if_underpartitioned(docs, "doc_id").select(
        "doc_id",
        "lang",
        F.explode(F.split("text", " ")).alias("term"),
    ).filter(F.col("term") != "")
    train = toks.filter(F.col("doc_id") % NB_FOLD_MOD != 0)

    # Same checkpoint lever as the binary classifier above: the
    # vocabulary-scale pivot has two consumers (stats, the scored
    # broadcast join) — one lazy checkpoint each for counts and the
    # one-row stats stops the corpus-wide token pivot re-executing per
    # consumer (5 -> 3 executed scans, round-12 audit).
    counts = (
        train.groupBy("term")
        .pivot("lang", NB_LANGS)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .transform(cut_lineage)
    )
    stats = counts.agg(
        *[F.sum(l).alias(f"tot_{l}") for l in NB_LANGS],
        F.count("*").alias("vocab"),
    ).transform(cut_lineage)
    priors = (
        train.select("doc_id", "lang")
        .distinct()
        .groupBy()
        .agg(
            *[
                F.sum((F.col("lang") == l).cast("bigint")).alias(f"nd_{l}")
                for l in NB_LANGS
            ],
            F.count("*").alias("nd_all"),
        )
    )
    held = toks.filter(F.col("doc_id") % NB_FOLD_MOD == 0)
    # fold the constant denominator into each term's contribution
    # BEFORE grouping (a one-row broadcast column can't appear bare
    # inside an aggregate): ll_l = sum(ln(n_l+1) - ln(tot_l+V)).
    # The vocabulary-scale model BROADCASTS into the token stream —
    # the inverted-index discipline the module's scale story rests on.
    scored = (
        held.join(F.broadcast(counts), "term", "left")
        .na.fill({l: 0 for l in NB_LANGS})
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "lang",
            *[
                (
                    F.log(F.col(l) + 1)
                    - F.log(F.col(f"tot_{l}") + F.col("vocab"))
                ).alias(f"c_{l}")
                for l in NB_LANGS
            ],
        )
        .groupBy("doc_id", "lang")
        .agg(*[F.sum(f"c_{l}").alias(f"ll_{l}") for l in NB_LANGS])
    )
    # token-less held-out docs (empty/whitespace text) never reach the
    # token stream — score them from the prior alone, like the binary
    # classifier's left-join fallback
    held_docs = docs.filter(F.col("doc_id") % NB_FOLD_MOD == 0).select(
        "doc_id", "lang"
    )
    scored = held_docs.join(scored, ["doc_id", "lang"], "left").na.fill(
        {f"ll_{l}": 0.0 for l in NB_LANGS}
    )
    # round the decision scores to 6dp so near-ties resolve identically
    # across engines (the binary classifier's decision-boundary guard)
    pick = F.array_max(
        F.array(
            *[
                F.struct(
                    F.round(
                        F.col(f"ll_{l}")
                        + F.log(F.col(f"nd_{l}") + 1)
                        - F.log(F.col("nd_all") + F.lit(len(NB_LANGS))),
                        6,
                    ).alias("s"),
                    F.lit(l).alias("l"),
                )
                for l in NB_LANGS
            ]
        )
    )["l"]
    return (
        scored.crossJoin(F.broadcast(priors))
        .select(F.col("lang").alias("true_lang"), pick.alias("pred_lang"))
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def q_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nb_multiclass_confusion(_docs(spark, sf_dir))


def _nb_confusion_oracle() -> str:
    langs = NB_LANGS
    count_cols = ",\n         ".join(
        f"sum(CASE WHEN lang = '{l}' THEN 1 ELSE 0 END) AS n_{l}"
        for l in langs
    )
    tot_cols = ", ".join(f"sum(n_{l}) AS tot_{l}" for l in langs)
    nd_cols = ", ".join(
        f"sum(CASE WHEN lang = '{l}' THEN 1 ELSE 0 END) AS nd_{l}"
        for l in langs
    )
    # per-token contribution form, matching the engine's summation
    ll_cols = ",\n         ".join(
        f"sum(ln(coalesce(n_{l}, 0) + 1) - ln((SELECT tot_{l} FROM stats) + (SELECT vocab FROM stats))) AS ll_{l}"
        for l in langs
    )
    structs = ", ".join(
        f"{{'s': round(coalesce(ll_{l}, 0) + ln((SELECT nd_{l} FROM priors) + 1) - ln((SELECT nd_all FROM priors) + {len(langs)}), 6), 'l': '{l}'}}"
        for l in langs
    )
    ll_sel = ", ".join(f"s.ll_{l} AS ll_{l}" for l in langs)
    return f"""WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
  FROM documents
), tok AS (
  SELECT * FROM toks WHERE term <> ''
), train AS (
  SELECT * FROM tok WHERE doc_id % 5 <> 0
), counts AS (
  SELECT term,
         {count_cols}
  FROM train GROUP BY term
), stats AS (
  SELECT {tot_cols}, count(*) AS vocab FROM counts
), priors AS (
  SELECT {nd_cols}, count(*) AS nd_all
  FROM (SELECT DISTINCT doc_id, lang FROM train)
), held AS (
  SELECT * FROM tok WHERE doc_id % 5 = 0
), scored AS (
  SELECT h.doc_id, h.lang,
         {ll_cols}
  FROM held h LEFT JOIN counts c ON h.term = c.term
  GROUP BY h.doc_id, h.lang
), held_docs AS (
  SELECT doc_id, lang FROM documents WHERE doc_id % 5 = 0
), full_scored AS (
  SELECT d.doc_id, d.lang, {ll_sel}
  FROM held_docs d LEFT JOIN scored s
    ON d.doc_id = s.doc_id AND d.lang = s.lang
), picked AS (
  SELECT lang AS true_lang,
         (list_max([{structs}])).l AS pred_lang
  FROM full_scored
)
SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
FROM picked GROUP BY 1, 2"""


QUERIES["text_nb_confusion"] = (q_nb_confusion, _nb_confusion_oracle())


# ------------------------------------------------------------------
# Exact-substring dedup, APPLY pass: remove duplicated n-gram spans

def dup_span_removal(
    docs: DataFrame, n: int = DUP_NGRAM_N, digest_keys: bool = False
) -> DataFrame:
    """The second half of the suffix-array-style exact-substring dedup
    recipe (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): ``dup_ngram_spans`` finds the duplicated
    n-word spans; this pass merges each doc's overlapping/adjacent hit
    ranges into maximal islands and emits the corpus with those word
    ranges REMOVED, plus per-doc removal stats.  Policy: every
    occurrence of a cross-doc duplicated span is dropped (the strict
    variant of the paper's recipe), so the output is deterministic.

    Shape: the hit join is span-table-sized (self-limiting — support
    >= 2 spans only), the island merge is a doc-partitioned window
    (doc-bounded state, no global sort), and the apply is one
    projection with an array filter over the collected span list
    (spans per doc are few after merging).  At 100 TB the work scales
    with duplicate MASS, not corpus² — measured in BASELINE.md.

    Output: (doc_id, n_spans, n_words_removed, n_chars_removed,
    text_clean) for EVERY doc (0/0/0/original when nothing dups).
    """
    from pyspark.sql import Window

    grams = _gram_stream(docs, n)
    if digest_keys:
        # cluster-scale knob: the support agg keys on the span TEXT —
        # near-unique keys defeat map-side combine, so ~1.2x corpus
        # bytes shuffle once (measured 15.3 MB at sf0.1's 13 MB
        # corpus).  md5 keys quarter the shuffled bytes for
        # network-shuffle deployments; locally the hash CPU outweighs
        # the disk-shuffle savings (A/B: 4.36 -> 4.68 s), so the
        # default stays text-keyed.  Output identical either way
        # (pinned in tests/test_wave12.py).
        grams = grams.select(
            "doc_id", "s", "e", F.md5("ngram").alias("ngram")
        )
    dup = (
        grams.groupBy("ngram")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("ngram")
    )
    hits = grams.join(dup, "ngram").select("doc_id", "s", "e")
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = hits.withColumn(
        "new_isl",
        (
            F.col("s")
            > F.coalesce(F.max("e").over(w_prev), F.lit(-1)) + 1
        ).cast("int"),
    ).withColumn("island", F.sum("new_isl").over(w_run))
    merged = islands.groupBy("doc_id", "island").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )
    per_doc = merged.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias(
            "n_words_removed"
        ),
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("spans"),
    )
    joined = docs.select("doc_id", "text").join(per_doc, "doc_id", "left")
    clean = F.when(F.col("spans").isNull(), F.col("text")).otherwise(
        F.expr(
            "concat_ws(' ', filter(split(text, ' '), (x, i) -> "
            "NOT exists(spans, sp -> sp.s <= i + 1 AND i + 1 <= sp.e)))"
        )
    )
    return joined.select(
        "doc_id",
        F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
        F.coalesce("n_words_removed", F.lit(0))
        .cast("bigint")
        .alias("n_words_removed"),
        (F.length("text") - F.length(clean)).cast("bigint").alias(
            "n_chars_removed"
        ),
        clean.alias("text_clean"),
    )


ORACLE_DUP_SPAN_REMOVAL = f"""WITH w AS (
  SELECT doc_id, text, string_split(text, ' ') AS words FROM documents
), g AS (
  SELECT doc_id, i AS s, i + {DUP_NGRAM_N - 1} AS e,
         array_to_string(words[i:i + {DUP_NGRAM_N - 1}], ' ') AS ngram
  FROM w, unnest(generate_series(1, len(words) - {DUP_NGRAM_N - 1})) t(i)
  WHERE len(words) >= {DUP_NGRAM_N}
), dup AS (
  SELECT ngram FROM g GROUP BY ngram HAVING count(DISTINCT doc_id) >= 2
), hits AS (
  SELECT g.doc_id, g.s, g.e FROM g JOIN dup USING (ngram)
), isl AS (
  SELECT doc_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (
                PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS new_isl
  FROM hits
), isl2 AS (
  SELECT doc_id, s, e,
         sum(new_isl) OVER (PARTITION BY doc_id ORDER BY s) AS island
  FROM isl
), m AS (
  SELECT doc_id, island, min(s) AS s, max(e) AS e
  FROM isl2 GROUP BY 1, 2
), per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(e - s + 1) AS BIGINT) AS n_words_removed
  FROM m GROUP BY doc_id
), cov AS (
  SELECT DISTINCT doc_id, j FROM m, unnest(generate_series(s, e)) v(j)
), tok AS (
  SELECT doc_id, i, words[i] AS word
  FROM w, unnest(generate_series(1, len(words))) t(i)
), kept AS (
  SELECT t.doc_id, string_agg(t.word, ' ' ORDER BY t.i) AS text_clean
  FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.i = c.j
  WHERE c.j IS NULL GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(p.n_words_removed, 0) AS BIGINT) AS n_words_removed,
       CAST(length(d.text) - length(coalesce(k.text_clean, ''))
            AS BIGINT) AS n_chars_removed,
       coalesce(k.text_clean, '') AS text_clean
FROM documents d
LEFT JOIN per_doc p USING (doc_id)
LEFT JOIN kept k ON d.doc_id = k.doc_id"""


def q_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return dup_span_removal(_docs(spark, sf_dir))


QUERIES["corpus_dup_span_removal"] = (
    q_dup_span_removal,
    ORACLE_DUP_SPAN_REMOVAL,
)
