"""Corpus-construction operators for LLM training-data pipelines.

Three staples of large-scale dataset building, each pure Catalyst,
deterministic (no RNG state — reproducible shards/samples are a hard
requirement for dataset lineage), and DuckDB-oracle-checkable:

* :func:`hash_sample` — deterministic Bernoulli sampling: keep a doc iff
  the first 6 hex digits of ``md5(doc_id)`` fall below the rate
  threshold.  Hex-lexicographic compare == numeric compare, identical
  in every engine; the SAME doc set is selected on any cluster, any
  run, any engine — unlike ``df.sample`` whose result depends on
  partitioning.
* :func:`doc_chunks` — fixed-size token chunking (the LLM preprocessing
  step: split each document into ``chunk_tokens``-token pieces).
  ``split`` + ``sequence`` + ``slice``: one map stage, no shuffle.
* :func:`doc_packing` — contiguous sequence packing: shard the corpus,
  then assign docs to packs by cumulative token count so each pack
  holds ~``target_tokens`` tokens (greedy contiguous packing, the
  standard approximation of bin packing used by training pipelines).
  The running sum is a window PARTITIONED BY shard — packing is
  per-shard by construction, so no global sort exists at any scale.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io_tables import load_table, parallelize_if_underpartitioned
from ..functions.checkpoint import cut_lineage

SAMPLE_RATE_HEX = "0ccccd"  # first 6 md5 hex digits < this ~= 5.0%
CHUNK_TOKENS = 64
PACK_TARGET_TOKENS = 512
PACK_SHARDS = 8


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _md5_hex(col: str):
    """md5 hex of an id column — THE hash every deterministic sampler
    here keys on; must stay byte-identical to the oracles'
    md5(CAST(id AS VARCHAR)) (string then binary cast)."""
    return F.md5(F.col(col).cast("string").cast("binary"))


def hash_sample(
    docs: DataFrame, threshold_hex: str = SAMPLE_RATE_HEX, key: str = "doc_id"
) -> DataFrame:
    """Deterministic ~rate sample: md5-hex prefix below threshold.
    Columns pass through, so the sampler works on ANY keyed frame
    (the old form hard-selected doc_id/text and broke on key=...)."""
    prefix = F.substring(_md5_hex(key), 1, 6)
    return docs.filter(prefix < F.lit(threshold_hex))


def doc_chunks(
    docs: DataFrame, chunk_tokens: int = CHUNK_TOKENS
) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk_text): fixed-size token chunks.

    The final partial chunk is kept (training pipelines pad or drop it
    downstream); empty docs produce no chunks.
    """
    k = chunk_tokens
    toks = F.split(F.col("text"), " ")
    # rebalance before the chunk fan-out when the scan under-splits
    # (single-row-group local files; exact no-op on a well-split lake)
    docs = parallelize_if_underpartitioned(docs, "doc_id")
    return (
        docs.withColumn("__toks", toks)
        .withColumn("__n", F.size("__toks"))
        # text != '' as well: split('', ' ') is [''] with size 1, so the
        # size guard alone let an empty doc emit a bogus 1-token chunk
        .filter((F.col("__n") > 0) & (F.col("text") != ""))
        .select(
            "doc_id",
            "__toks",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor((F.col("__n") - 1) / k).cast("int"),
                )
            ).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.expr(f"slice(__toks, chunk_idx * {k} + 1, {k})").alias("__c"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.size("__c").cast("bigint").alias("n_tokens"),
            F.concat_ws(" ", "__c").alias("chunk_text"),
        )
    )


def doc_packing(
    docs: DataFrame,
    target_tokens: int = PACK_TARGET_TOKENS,
    shards: int = PACK_SHARDS,
) -> DataFrame:
    """Per-pack summary of contiguous greedy packing.

    Docs are sharded by ``doc_id % shards`` (each shard packs
    independently — the parallel unit); within a shard, doc order is
    doc_id and a doc joins pack ``floor(preceding_tokens /
    target_tokens)``.  Output: (shard, pack_id, n_docs, total_tokens).
    """
    toks = F.size(F.split(F.col("text"), " ")).cast("bigint")
    sharded = docs.select(
        "doc_id",
        (F.col("doc_id") % shards).alias("shard"),
        toks.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = sharded.withColumn(
        "pack_id",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / target_tokens
        ).cast("bigint"),
    )
    return packed.groupBy("shard", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


STRATIFIED_PER_LABEL = 10


STRATIFIED_SALTS = 16


def stratified_sample(
    emb: DataFrame,
    per_label: int = STRATIFIED_PER_LABEL,
    n_salts: int = STRATIFIED_SALTS,
) -> DataFrame:
    """Class-balanced downsampling: keep ``per_label`` rows per label,
    chosen deterministically as the smallest md5(vec_id) hashes.

    The standard training-mix rebalancer (cap every class at N), made
    reproducible: the SAME rows are selected on any engine/run —
    ``df.sampleBy`` gives a rate, not a count, and depends on
    partitioning.

    Hot-label safe: a naive ``Window.partitionBy(label)`` sends every
    row of a dominant label through ONE task.  Instead the rank runs in
    two phases: (1) a salted pre-rank over ``(label, salt)`` shards —
    each shard keeps its own top-``per_label``, so any label's rows
    spread over ``n_salts`` tasks and at most ``n_salts * per_label``
    survivors remain per label; (2) an exact re-rank of the tiny
    survivor set over ``label`` alone.  Answer-identical to the single
    window: the global top-``per_label`` rows of a label each rank
    <= per_label inside their own shard, so phase 1 never drops them,
    and every row ordered before a kept row also survives, so phase-2
    ranks equal global ranks.
    """
    order_cols = [
        F.md5(F.col("vec_id").cast("string").cast("binary")),
        F.col("vec_id"),
    ]
    salt = F.pmod(F.hash("vec_id"), F.lit(n_salts))
    w_shard = Window.partitionBy("label", "__salt").orderBy(*order_cols)
    survivors = (
        emb.withColumn("__salt", salt)
        .withColumn("__srk", F.row_number().over(w_shard))
        .filter(F.col("__srk") <= per_label)
    )
    w_final = Window.partitionBy("label").orderBy(*order_cols)
    return (
        survivors.withColumn("__rk", F.row_number().over(w_final))
        .filter(F.col("__rk") <= per_label)
        .select(
            "vec_id",
            "label",
            F.col("__rk").cast("bigint").alias("sample_rank"),
        )
    )


DECON_NGRAM = 4  # real pipelines use 8-13; 4 suits the synthetic vocab
DECON_BENCH_MOD = 97  # doc_id % 97 == 0 -> held-out benchmark doc


def gram_stream(docs: DataFrame, n: int = DECON_NGRAM) -> DataFrame:
    """Distinct (doc_id, gram) word n-grams — shared by the
    inverted-index and Bloom-prefiltered decontaminate plans (one
    tokenization, no drift).  Rebalanced before the n-gram fan-out when
    the scan under-splits (exact no-op on a well-split lake)."""
    ws = F.split(F.col("text"), " ")
    docs = parallelize_if_underpartitioned(docs, "doc_id")
    return (
        docs.withColumn("ws", ws)
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


def decontaminate(
    docs: DataFrame,
    n: int = DECON_NGRAM,
    bench_mod: int = DECON_BENCH_MOD,
) -> DataFrame:
    """Benchmark decontamination: training docs sharing any word
    ``n``-gram with a held-out benchmark set.

    The standard eval-leak scrub before pretraining (exact n-gram
    collision, the GPT-3/PaLM recipe).  Benchmark = docs with
    ``doc_id % bench_mod == 0``; output = contaminated TRAINING docs
    with their distinct colliding-gram count (downstream drops or
    re-chunks them).  Inverted-index equi-join on the n-gram — the
    same scale shape as the Jaccard shingle join: long n-grams are
    discriminative, so the per-gram posting lists stay short and the
    join never approaches |train| x |bench|.
    """
    grams = gram_stream(docs, n)
    is_bench = F.col("doc_id") % bench_mod == 0
    bench_grams = grams.filter(is_bench).select("gram").distinct()
    return (
        grams.filter(~is_bench)
        .join(bench_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


SHUFFLE_SHARDS = 16


def shuffle_shards(docs: DataFrame, n_shards: int = SHUFFLE_SHARDS) -> DataFrame:
    """Deterministic global shuffle for training export: every doc gets
    a pseudorandom (shard, pos) that is identical on any engine/run.

    shard = first md5 hex digit of the doc id (uniform 16-way);
    pos    = rank of md5(doc_id) within the shard.
    The shard hash is a map expression and the rank is a window
    PARTITIONED BY shard — a 100-TB corpus shuffles with one bounded
    exchange, no global sort.  (n_shards must divide 16 or be 16 here
    since the digit is the shard key; production uses more hex chars.)
    """
    h = _md5_hex("doc_id")
    shard = (
        F.expr(
            "locate(substr(md5(cast(cast(doc_id as string) as binary)), 1, 1),"
            " '0123456789abcdef') - 1"
        )
        % n_shards
    )
    w = Window.partitionBy("__shard").orderBy("__h", "doc_id")
    return (
        docs.select(
            "doc_id",
            shard.cast("bigint").alias("__shard"),
            h.alias("__h"),
        )
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("doc_id", F.col("__shard").alias("shard"), "pos")
    )


TOKEN_BUDGET_PER_SOURCE = 800


def token_budget_sample(
    docs: DataFrame, budget: int = TOKEN_BUDGET_PER_SOURCE
) -> DataFrame:
    """Mixture construction under a per-source token budget: walk each
    source's docs in deterministic md5 order, keep while the RUNNING
    token total (inclusive) stays within the budget.

    The data-mixing primitive behind weighted pretraining recipes
    ("x tokens from source A, y from B"): deterministic order makes the
    mix reproducible, and the running sum is a window PARTITIONED BY
    source — per-source sequential, cross-source parallel.  A hot
    source bounds a partition; shard it with the salted-rank idiom of
    :func:`stratified_sample` when a single source dominates.
    """
    h = _md5_hex("doc_id")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("bigint")
    w = Window.partitionBy("source").orderBy("__h", "doc_id")
    return (
        docs.select(
            "doc_id", "source", n_tokens.alias("n_tokens"), h.alias("__h")
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )


# ------------------------------------------------------------- oracles

ORACLE_HASH_SAMPLE = f"""SELECT doc_id, text FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) < '{SAMPLE_RATE_HEX}'"""

ORACLE_DOC_CHUNKS = f"""WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents
  WHERE len(string_split(text, ' ')) > 0 AND text != ''
),
c AS (
  SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
         list_slice(toks, i * {CHUNK_TOKENS} + 1, (i + 1) * {CHUNK_TOKENS}) AS ch
  FROM t, unnest(generate_series(0, CAST(floor((n - 1) / {CHUNK_TOKENS}) AS BIGINT))) AS u(i)
)
SELECT doc_id, chunk_idx, CAST(len(ch) AS BIGINT) AS n_tokens,
       array_to_string(ch, ' ') AS chunk_text
FROM c"""

ORACLE_DOC_PACKING = f"""WITH s AS (
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
p AS (
  SELECT shard, n_tokens,
         CAST(floor(COALESCE(sum(n_tokens) OVER (
             PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           / {PACK_TARGET_TOKENS}) AS BIGINT) AS pack_id
  FROM s
)
SELECT shard, pack_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM p GROUP BY 1, 2"""


ORACLE_DECONTAMINATE = f"""WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
  WHERE len(string_split(text, ' ')) >= {DECON_NGRAM}
),
grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(ws, i, i + {DECON_NGRAM - 1}), ' ') AS gram
  FROM w, unnest(generate_series(1, len(ws) - {DECON_NGRAM - 1})) AS t(i)
),
bench AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % {DECON_BENCH_MOD} = 0
)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM grams g JOIN bench b ON g.gram = b.gram
WHERE g.doc_id % {DECON_BENCH_MOD} != 0
GROUP BY 1"""


ORACLE_SHUFFLE_SHARDS = f"""WITH h AS (
  SELECT doc_id,
         md5(CAST(doc_id AS VARCHAR)) AS hh,
         CAST((strpos('0123456789abcdef',
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
              % {SHUFFLE_SHARDS} AS BIGINT) AS shard
  FROM documents
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY hh, doc_id)
            AS BIGINT) AS pos
FROM h"""


ORACLE_TOKEN_BUDGET = f"""WITH s AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS hh
  FROM documents
),
r AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY hh, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM s
)
SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM r WHERE cum_tokens <= {TOKEN_BUDGET_PER_SOURCE}"""


ORACLE_STRATIFIED_SAMPLE = f"""WITH r AS (
  SELECT vec_id, label,
         CAST(row_number() OVER (PARTITION BY label
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT)
           AS sample_rank
  FROM embeddings
)
SELECT vec_id, label, sample_rank FROM r
WHERE sample_rank <= {STRATIFIED_PER_LABEL}"""


# ------------------------------------------------------------- registry

def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stratified_sample(load_table(spark, sf_dir, "embeddings"))


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hash_sample(_docs(spark, sf_dir)).select("doc_id", "text")


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_chunks(_docs(spark, sf_dir))


def q_doc_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_packing(_docs(spark, sf_dir))


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decontaminate(_docs(spark, sf_dir))


def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shuffle_shards(_docs(spark, sf_dir))


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_budget_sample(_docs(spark, sf_dir))


QUERIES = {
    "corpus_hash_sample": (q_hash_sample, ORACLE_HASH_SAMPLE),
    "corpus_doc_chunks": (q_doc_chunks, ORACLE_DOC_CHUNKS),
    "corpus_doc_packing": (q_doc_packing, ORACLE_DOC_PACKING),
    "corpus_stratified_sample": (q_stratified_sample, ORACLE_STRATIFIED_SAMPLE),
    "corpus_decontaminate": (q_decontaminate, ORACLE_DECONTAMINATE),
    "corpus_shuffle_shards": (q_shuffle_shards, ORACLE_SHUFFLE_SHARDS),
    "corpus_token_budget_sample": (q_token_budget, ORACLE_TOKEN_BUDGET),
}


def clean_corpus_summary(docs: DataFrame) -> DataFrame:
    """The composed LLM-data cleaning pipeline, end-to-end in ONE plan:

        quality filter (C4 rules)  ->  exact dedup (keep-first by
        content digest)  ->  benchmark decontamination
        (DECON_NGRAM-gram collision scrub)  ->  per-(lang, source)
        corpus summary

    Each stage is the registered operator's own logic (quality rules
    shared via text.quality_checks; digest/dedup and the gram join are
    the dedup_exact / corpus_decontaminate shapes), so the composition
    proves the stages snap together without materialization barriers:
    Catalyst plans the whole thing as one DAG — filters fold into the
    scan, the dedup rollup and the anti-join stack on their own keyed
    exchanges, and the output is a tiny integer table (no float
    rounding surface at all).

    The benchmark set (doc_id % DECON_BENCH_MOD == 0) is carved from
    the ORIGINAL corpus (contamination is defined against the eval set
    as published, not against whatever survived earlier stages);
    benchmark members are also excluded from the training output.
    """
    from .text import quality_checks

    is_bench = F.col("doc_id") % DECON_BENCH_MOD == 0
    keep = reduce(lambda a, b: a & b, [ok for _, ok in quality_checks()])
    kept = docs.filter(~is_bench).filter(keep)
    # keep-first among surviving training docs (digest over full text)
    reps = (
        kept.withColumn("digest", F.md5(F.col("text").cast("binary")))
        .groupBy("digest")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    contaminated = decontaminate(docs).select("doc_id")
    clean = (
        kept.join(reps, "doc_id", "left_semi")
        .join(contaminated, "doc_id", "left_anti")
    )
    return clean.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
    )


ORACLE_CLEAN_CORPUS = f"""WITH q AS (
  SELECT *,
         len(string_split(text, ' ')) >= 10 AS ok_min_words,
         list_max(list_transform(string_split(text, ' '), w -> length(w)))
           <= 20 AS ok_word_len,
         NOT contains(lower(text), 'lorem ipsum') AS ok_lorem,
         NOT contains(text, '{{') AS ok_braces
  FROM documents
  WHERE doc_id % {DECON_BENCH_MOD} != 0
), kept AS (
  SELECT * FROM q
  WHERE ok_min_words AND ok_word_len AND ok_lorem AND ok_braces
), reps AS (
  SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)
), w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
  WHERE len(string_split(text, ' ')) >= {DECON_NGRAM}
), grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(ws, i, i + {DECON_NGRAM - 1}), ' ') AS gram
  FROM w, unnest(generate_series(1, len(ws) - {DECON_NGRAM - 1})) AS t(i)
), bench AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % {DECON_BENCH_MOD} = 0
), contaminated AS (
  SELECT DISTINCT g.doc_id
  FROM grams g JOIN bench b ON g.gram = b.gram
  WHERE g.doc_id % {DECON_BENCH_MOD} != 0
), clean AS (
  SELECT k.* FROM kept k
  JOIN reps r ON k.doc_id = r.doc_id
  WHERE k.doc_id NOT IN (SELECT doc_id FROM contaminated)
)
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS min_doc_id
FROM clean
GROUP BY 1, 2"""


def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clean_corpus_summary(_docs(spark, sf_dir))


QUERIES["corpus_clean_pipeline"] = (q_clean_corpus, ORACLE_CLEAN_CORPUS)


# ------------------------------------------------------ mixture sampling

#: per-language target sampling rates for the training mixture (the
#: data-mixing step of an LLM pipeline: up/down-weight sources to hit a
#: composition target).  Rates are acceptance probabilities applied
#: deterministically per doc.
MIXTURE_RATES: dict[str, float] = {
    "en": 1.0,
    "de": 0.5,
    "fr": 0.5,
    "es": 0.25,
    "zh": 0.25,
}
MIXTURE_DEFAULT_RATE = 0.1


def mixture_sample(
    docs: DataFrame,
    rates: dict[str, float] | None = None,
    default_rate: float = MIXTURE_DEFAULT_RATE,
) -> DataFrame:
    """Deterministic per-group mixture sampling: keep each doc with its
    language's target rate.

    Acceptance is a pure function of doc_id (md5-hex prefix below a
    per-lang threshold), so the sample is reproducible across runs,
    engines and partitionings — rerunning the pipeline after adding a
    source cannot silently reshuffle which documents of the OLD sources
    survive (the property random() sampling lacks).  The rate table is
    a broadcast dim (metadata scale); the filter is map-only, no
    shuffle, and prunes before any downstream stage — at 100 TB the
    mixture step costs one scan.

    Output: (doc_id, lang, source) of surviving docs.
    """
    rates = MIXTURE_RATES if rates is None else rates
    spark = docs.sparkSession
    dim = spark.createDataFrame(
        [(lang, _rate_hex(r)) for lang, r in rates.items()],
        "lang string, __thr string",
    )
    prefix = F.substring(_md5_hex("doc_id"), 1, 8)
    return (
        docs.join(F.broadcast(dim), "lang", "left")
        .withColumn(
            "__thr2", F.coalesce(F.col("__thr"), F.lit(_rate_hex(default_rate)))
        )
        .filter(prefix < F.col("__thr2"))
        .select("doc_id", "lang", "source")
    )


def _rate_hex(rate: float) -> str:
    """Acceptance rate -> threshold the 8-hex md5 prefix is compared
    (strictly) against.  rate >= 1 returns 'g', which sorts above
    every hex string, so a keep-all language truly keeps ALL docs —
    capping at 'ffffffff' silently excluded the prefix == 'ffffffff'
    tail (p = 2^-32 per doc)."""
    if rate >= 1.0:
        return "g"
    return format(max(0, int(rate * 16**8)), "08x")


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mixture_sample(_docs(spark, sf_dir))


def _mixture_oracle() -> str:
    cases = " ".join(
        f"WHEN lang = '{lang}' THEN '{_rate_hex(r)}'"
        for lang, r in MIXTURE_RATES.items()
    )
    return f"""SELECT doc_id, lang, source FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      < CASE {cases} ELSE '{_rate_hex(MIXTURE_DEFAULT_RATE)}' END"""


QUERIES["corpus_mixture_sample"] = (q_mixture_sample, _mixture_oracle())


# ------------------------------------------------------- upsert (merge)

UPSERT_REV_MOD = 7  # docs with doc_id % 7 == 0 arrive revised
UPSERT_NEW_MOD = 97  # docs with doc_id % 97 == 0 spawn a new doc id
UPSERT_NEW_OFFSET = 1_000_000_000


def upsert_latest(
    snapshot: DataFrame, delta: DataFrame, key_cols: tuple[str, ...]
) -> DataFrame:
    """MERGE a delta into a snapshot: delta rows win on key collision,
    new keys append — the daily-ingest upsert every incremental corpus
    lake performs.

    Shape chosen for the realistic size skew (delta << snapshot): LEFT
    ANTI join drops replaced snapshot rows, then UNION appends the
    delta.  The anti join's build side is the delta — AQE broadcasts it
    when small, so the 100-TB snapshot is never shuffled; a full-outer
    formulation would shuffle BOTH sides on the key.  Columns must
    match; output carries exactly one row per key.
    """
    keys = list(key_cols)
    survivors = snapshot.join(delta.select(*keys), keys, "left_anti")
    return survivors.unionByName(delta)


def q_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry shape: a deterministic delta derived from the corpus
    itself (every UPSERT_REV_MOD-th doc revised, every
    UPSERT_NEW_MOD-th doc spawning a brand-new id), merged back.
    Output: the upserted snapshot with a revision marker."""
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "source", "text")
    # The synthetic delta used to be two filtered branches unioned —
    # and the delta frame has TWO consumers inside upsert_latest (the
    # anti-join keys and the appended union), so Catalyst executed the
    # two-scan subtree twice: 5 corpus scans (round-12 audit).  One
    # conditional-explode scan derives both branches (a doc divisible
    # by both mods emits both rows, same as the union), and a lazy
    # checkpoint of the delta-scale frame (~16% of the corpus) serves
    # both consumers.  Interleaved full-cost A/B at sf0.1: 0.49 ->
    # 0.47 s median-of-5, hash-identical.  Executor-loss caveat: see
    # events_association_rules (relational.py).
    rev = F.col("doc_id") % UPSERT_REV_MOD == 0
    new = F.col("doc_id") % UPSERT_NEW_MOD == 0

    def _mk(did, txt):
        return F.struct(
            did.alias("doc_id"), F.col("lang"), F.col("source"),
            txt.alias("text"),
        )

    delta = (
        docs.filter(rev | new)
        .select(
            F.explode(
                F.concat(
                    F.when(
                        rev,
                        F.array(_mk(
                            F.col("doc_id"),
                            F.concat(F.col("text"), F.lit(" [rev2]")),
                        )),
                    ).otherwise(F.array()),
                    F.when(
                        new,
                        F.array(_mk(
                            F.col("doc_id") + UPSERT_NEW_OFFSET,
                            F.col("text"),
                        )),
                    ).otherwise(F.array()),
                )
            ).alias("r")
        )
        .select("r.*")
        .transform(cut_lineage)
    )
    merged = upsert_latest(docs, delta, ("doc_id",))
    return merged.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").cast("bigint").alias("n_chars"),
        F.md5(F.col("text").cast("binary")).alias("digest"),
    )


ORACLE_UPSERT = f"""WITH base AS (
  SELECT doc_id, lang, source, text FROM documents
), delta AS (
  SELECT doc_id, lang, source, text || ' [rev2]' AS text
  FROM base WHERE doc_id % {UPSERT_REV_MOD} = 0
  UNION ALL
  SELECT doc_id + {UPSERT_NEW_OFFSET}, lang, source, text
  FROM base WHERE doc_id % {UPSERT_NEW_MOD} = 0
), merged AS (
  SELECT * FROM base
  WHERE doc_id NOT IN (SELECT doc_id FROM delta)
  UNION ALL
  SELECT * FROM delta
)
SELECT doc_id, lang, source,
       CAST(length(text) AS BIGINT) AS n_chars,
       md5(text) AS digest
FROM merged"""

QUERIES["corpus_upsert_latest"] = (q_upsert_latest, ORACLE_UPSERT)


#: importance-sampling length target: docs at/above keep with prob 1.
IMPORTANCE_TARGET_CHARS = 400.0


def importance_sample(
    docs: DataFrame, target_chars: float = IMPORTANCE_TARGET_CHARS
) -> DataFrame:
    """Quality-weighted deterministic sampling (importance resampling,
    the DoReMi/data-mixing primitive): each document keeps with
    probability ``min(1, n_chars / target)`` — longer docs always
    survive, short ones proportionally — using the doc's md5 as the
    uniform draw, so the decision is reproducible per document across
    runs and engines (same family as :func:`hash_sample`, but with a
    PER-DOC weight instead of a global rate).

    Map-only: a projection + filter over the scan, no exchange at any
    corpus size.  u = first 24 md5 bits / 2^24 (exact in double)."""
    u = (
        F.conv(
            F.substring(
                _md5_hex("doc_id"), 1, 6
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**6))
    )
    w = F.least(F.lit(1.0), F.col("n_chars") / F.lit(target_chars))
    return docs.filter(u < w).select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.round(w, 6).alias("keep_weight"),
    )


def q_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return importance_sample(_docs(spark, sf_dir))


ORACLE_IMPORTANCE = f"""SELECT doc_id, lang, source, n_chars,
       round(least(1.0, n_chars / {IMPORTANCE_TARGET_CHARS}), 6)
         AS keep_weight
FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 6))::BIGINT
        / {float(16**6)}
      < least(1.0, n_chars / {IMPORTANCE_TARGET_CHARS})"""

QUERIES["corpus_importance_sample"] = (q_importance_sample, ORACLE_IMPORTANCE)
