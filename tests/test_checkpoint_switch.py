"""Round-12 verdict task 2: single-switch reliable checkpointing.

Every lineage-truncation site repo-wide routes through
``functions.checkpoint.cut_lineage``.  Default behaviour is the r12
``localCheckpoint(eager=...)`` (byte-identical plans); setting
``spark.sparkgraft.checkpoint.reliable=true`` plus a checkpoint dir
switches every site to fault-tolerant ``DataFrame.checkpoint`` with no
code edits.  These tests pin:

1. the repo has ZERO raw ``.localCheckpoint(`` call sites left outside
   the helper (one call-site pattern repo-wide);
2. flipping the conf re-runs three r12-touched queries to identical
   results, and the reliable run actually writes blocks into the
   checkpoint dir (proof the reliable branch executed);
3. reliable=true without any checkpoint dir raises immediately instead
   of silently degrading to the non-fault-tolerant path.
"""

from __future__ import annotations

import pathlib

import pytest

from prometheus_anomaly_detection_lstm_spark.functions.checkpoint import (
    DIR_CONF,
    RELIABLE_CONF,
    cut_lineage,
)
from prometheus_anomaly_detection_lstm_spark.registry import all_queries

SF = "/root/testdata/sf0.001"

#: three queries whose r12 plan change introduced a checkpoint
#: (shingle stream, bigram vocabulary, folded set-ops groupBy).
FLIP_QUERIES = ["user_set_ops", "text_pmi_collocations", "metric_seasonal_mad"]


def _rows(spark, name):
    fn = all_queries()[name][0]
    return sorted(map(tuple, fn(spark, SF).collect()))


def test_no_raw_local_checkpoint_call_sites():
    pkg = pathlib.Path(
        "prometheus_anomaly_detection_lstm_spark"
    ).resolve()
    if not pkg.exists():  # running from another cwd
        pkg = pathlib.Path(__file__).resolve().parents[1] / pkg.name
    offenders = []
    for p in pkg.rglob("*.py"):
        if p.name == "checkpoint.py" or "__pycache__" in str(p):
            continue
        if ".localCheckpoint(" in p.read_text():
            offenders.append(str(p))
    assert not offenders, f"raw localCheckpoint call sites: {offenders}"


def test_reliable_without_dir_raises(spark):
    # a session whose SparkContext already has a checkpoint dir cannot
    # exercise the misconfiguration path
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("session already has a checkpoint dir")
    spark.conf.set(RELIABLE_CONF, "true")
    try:
        with pytest.raises(ValueError, match="no checkpoint dir"):
            cut_lineage(spark.range(3).toDF("id"))
    finally:
        spark.conf.set(RELIABLE_CONF, "false")


def test_reliable_flip_same_results(spark, tmp_path):
    baseline = {q: _rows(spark, q) for q in FLIP_QUERIES}
    ckpt_dir = str(tmp_path / "reliable_ckpt")
    spark.conf.set(RELIABLE_CONF, "true")
    spark.conf.set(DIR_CONF, ckpt_dir)
    try:
        flipped = {q: _rows(spark, q) for q in FLIP_QUERIES}
    finally:
        spark.conf.set(RELIABLE_CONF, "false")
        spark.conf.unset(DIR_CONF)
    assert flipped == baseline
    # the reliable branch must actually have written checkpoint blocks
    written = [
        str(f)
        for f in pathlib.Path(ckpt_dir).rglob("*")
        if f.is_file()
    ]
    assert written, "reliable checkpoint dir is empty — branch not taken"


def test_default_path_is_local_checkpoint(spark):
    # default conf: the frame is localCheckpoint'd (RDD checkpointed
    # locally, lineage truncated), not reliably checkpointed
    df = cut_lineage(spark.range(3).toDF("id"), eager=True)
    assert "ExistingRDD" in (
        df._jdf.queryExecution().executedPlan().toString()
    )


def test_track_and_release_checkpoints(spark):
    """Measurement-loop hygiene: blocks of a checkpointed frame can be
    released once its pass completes (the r13 core-scaling run measured
    full-cost containment passes growing 555 -> 823 s at sf1 from
    accumulated never-unpersisted checkpoint blocks)."""
    from pyspark.sql import functions as F

    from prometheus_anomaly_detection_lstm_spark.functions.checkpoint import (
        release_checkpoints,
        track_checkpoints,
    )

    sc = spark.sparkContext
    before = len(sc._jsc.getPersistentRDDs())
    with track_checkpoints() as frames:
        df = cut_lineage(spark.range(1000).select(F.col("id") * 2))
        df.groupBy().count().collect()  # materialize the checkpoint
    assert len(frames) == 1
    during = len(sc._jsc.getPersistentRDDs())
    assert during > before, "checkpoint did not persist any RDD"
    released = release_checkpoints(frames)
    assert released == 1 and not frames
    after = len(sc._jsc.getPersistentRDDs())
    assert after == before, f"blocks not released ({before}->{during}->{after})"
