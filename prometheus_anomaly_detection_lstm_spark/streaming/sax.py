"""Streaming SAX novelty: live day-shapes checked against known words.

The serving-time half of plans/wave8.sax_motifs: per-series z-stats and
the dictionary of KNOWN day-words are learned once from history in
batch, broadcast into the stream as static sides, and every finalized
event-time day emits its SAX word — days whose word is not in the
dictionary are novel-shape alerts (the symbolic discord monitor; the
streaming twin of the batch novelty mining).

Structured-Streaming shape: Spark allows ONE aggregation per stream, so
the two-level batch rollup (hourly PAA -> day word) is folded into a
single 1-day-window aggregate producing 24 conditional hourly means as
columns (the same trick as streaming/drift's bucket counts); the word
is assembled in the post-aggregate projection (concat_ws skips NULL
hours exactly like the batch word skips absent hours).  The dictionary
check is a stream-static broadcast join + filter.  Append mode +
watermark emit each (series, day) exactly once with bounded state
(#series x open days x 24 doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.wave8 import SAX_BREAKPOINTS, sax_symbols


def sax_reference(batch: DataFrame):
    """(stats, known_words) learned from a history frame carrying
    (metric, ts, value): per-series mu/stddev_pop (degenerate series
    dropped) and the distinct day-words seen in history."""
    stats = (
        batch.groupBy("metric")
        .agg(
            F.avg("value").alias("mu"),
            F.stddev_pop("value").alias("sd"),
        )
        .filter(F.col("sd") > 0)
    )
    known = sax_symbols(batch).select("metric", "word").distinct()
    return stats, known


def _hour_symbol_sql(col: str) -> str:
    b1, b2, b3 = SAX_BREAKPOINTS
    return (
        f"CASE WHEN {col} IS NULL THEN NULL "
        f"WHEN {col} < {b1} THEN 'a' "
        f"WHEN {col} < {b2} THEN 'b' "
        f"WHEN {col} < {b3} THEN 'c' ELSE 'd' END"
    )


def streaming_sax_novelty(
    stream: DataFrame,
    stats: DataFrame,
    known: DataFrame,
    watermark: str = "1 hour",
) -> DataFrame:
    """Novel-day alerts (metric, day, n_segments, word) from a stream
    of (metric, ts, value) rows.  ``stats``/``known`` are the frozen
    batch reference from :func:`sax_reference`."""
    z = stream.join(F.broadcast(stats), "metric").withColumn(
        "z", (F.col("value") - F.col("mu")) / F.col("sd")
    )
    hourly = [
        F.round(
            F.avg(F.when(F.hour("ts") == h, F.col("z"))), 9
        ).alias(f"__h{h}")
        for h in range(24)
    ]
    agg = (
        z.withWatermark("ts", watermark)
        .groupBy("metric", F.window("ts", "1 day").alias("w"))
        .agg(*hourly)
    )
    word = F.expr(
        "concat_ws('', "
        + ", ".join(_hour_symbol_sql(f"__h{h}") for h in range(24))
        + ")"
    )
    n_seg = sum(
        F.when(F.col(f"__h{h}").isNotNull(), 1).otherwise(0)
        for h in range(24)
    )
    words = agg.select(
        "metric",
        F.col("w.start").alias("day"),
        n_seg.cast("bigint").alias("n_segments"),
        word.alias("word"),
    )
    flagged = words.join(
        F.broadcast(known.withColumn("__known", F.lit(1))),
        ["metric", "word"],
        "left",
    )
    return flagged.filter(F.col("__known").isNull()).select(
        "metric", "day", "n_segments", "word"
    )
