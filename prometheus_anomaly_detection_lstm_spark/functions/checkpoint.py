"""Single-switch lineage truncation for every checkpoint site repo-wide.

Round 12 landed ~40 lazy ``localCheckpoint(eager=False)`` sites (plus a
few eager ones inside iterative k-means/Lloyd loops) to stop Catalyst
re-executing shared vocabulary/metadata-scale subtrees once per
consumer.  ``localCheckpoint`` stores the blocks on executors only: on
a preemptible / dynamic-allocation cluster, losing an executor makes
the frame unrecomputable mid-query (the lineage is gone).  The round-12
verdict asked for one helper with a session switch instead of 40+
hand-edited call sites — this module is that switch.

Usage (call-site pattern, chain-preserving)::

    frame = (
        df.groupBy(...).agg(...)
        .transform(cut_lineage)          # lazy; was .localCheckpoint(eager=False)
    )
    rounds = seed.transform(cut_lineage_eager)  # was .localCheckpoint()

Default behaviour is byte-identical to before: ``localCheckpoint`` with
the same eagerness.  On a cluster where executor loss is expected, set

    spark.conf.set("spark.sparkgraft.checkpoint.reliable", "true")
    spark.sparkContext.setCheckpointDir("hdfs://.../checkpoints")
    # or: spark.conf.set("spark.sparkgraft.checkpoint.dir", "...")

and every site switches to reliable ``DataFrame.checkpoint`` (blocks on
the fault-tolerant store, survives executor loss) with no code edits.
The switch is read per call, so a long-lived session can flip it
between queries.  Misconfiguration (reliable=true but no checkpoint
dir anywhere) raises immediately rather than silently degrading to the
non-fault-tolerant path.

Test capture: the scan-count gates (tests/test_scan_gates.py) count
``Scan parquet`` nodes in executed plans, but a checkpoint truncates
its subtree to ``Scan ExistingRDD`` — a regression *below* a checkpoint
is invisible to the top-level plan.  ``capture_builders()`` records the
pre-truncation DataFrame of every checkpoint taken inside the block so
gates can count the builder subtrees' scans too.  Capture is off unless
the context manager is active (zero cost and zero retention in
production).
"""

from __future__ import annotations

import contextlib
from typing import Iterator

from pyspark.sql import DataFrame

RELIABLE_CONF = "spark.sparkgraft.checkpoint.reliable"
DIR_CONF = "spark.sparkgraft.checkpoint.dir"

#: When not None, every cut_lineage() appends its pre-truncation input
#: frame here (test-only; see capture_builders).
_capture: list[DataFrame] | None = None

#: When not None, every cut_lineage() appends its RETURNED
#: (checkpointed) frame here (measurement-loop use; see
#: track_checkpoints / release_checkpoints).
_capture_out: list[DataFrame] | None = None


@contextlib.contextmanager
def capture_builders() -> Iterator[list[DataFrame]]:
    """Record the pre-truncation builder frame of every checkpoint.

    Nested checkpoints are captured too (an inner cut_lineage fires
    while the outer builder is being constructed), so walking the
    returned list plus the query's own executed plan sees every scan
    the query will run.  Not thread-safe — test harness use only.
    """
    global _capture
    prev = _capture
    _capture = [] if prev is None else prev
    try:
        yield _capture
    finally:
        _capture = prev


@contextlib.contextmanager
def track_checkpoints() -> Iterator[list[DataFrame]]:
    """Collect the CHECKPOINTED frames created inside the block.

    Checkpointed blocks live on executors until session teardown (r12
    ADVICE): a full-cost measurement loop that constructs a fresh plan
    per pass accumulates one corpus-scale block set PER PASS — at sf1
    the text_containment_pairs passes measurably degrade (555 → 823 s
    by pass 5, r13 core-scaling run).  Wrap each pass and call
    :func:`release_checkpoints` on the collected frames AFTER the
    timed region.  Not thread-safe — measurement harness use only.
    """
    global _capture_out
    prev = _capture_out
    _capture_out = [] if prev is None else prev
    try:
        yield _capture_out
    finally:
        _capture_out = prev


def release_checkpoints(frames: list[DataFrame]) -> int:
    """Unpersist the executor blocks of checkpointed ``frames``.

    DANGER: a localCheckpoint'd frame has no lineage — after release it
    is UNRECOMPUTABLE and any further action on it (or a plan built on
    it) fails.  Only call on frames whose pass is complete and whose
    plan will be rebuilt from scratch (the full-cost loop shape).
    Returns the number of frames whose blocks were released.
    """
    n = 0
    for df in frames:
        try:
            # the checkpointed Dataset's analyzed plan is a LogicalRDD
            # wrapping the persisted internal RDD
            df._jdf.queryExecution().analyzed().rdd().unpersist(False)
            n += 1
        except Exception:  # noqa: BLE001 - best-effort cleanup
            continue
    frames.clear()
    return n


def cut_lineage(df: DataFrame, eager: bool = False) -> DataFrame:
    """Truncate ``df``'s lineage; local by default, reliable by conf.

    Semantics are those of ``localCheckpoint(eager=eager)`` unless the
    session sets ``spark.sparkgraft.checkpoint.reliable=true``, in
    which case ``DataFrame.checkpoint(eager=eager)`` is used (requires
    a checkpoint dir via ``setCheckpointDir`` or the
    ``spark.sparkgraft.checkpoint.dir`` conf).  Results are identical
    either way; only fault tolerance of the materialized blocks
    changes.
    """
    if _capture is not None:
        _capture.append(df)
    spark = df.sparkSession
    reliable = str(spark.conf.get(RELIABLE_CONF, "false")).lower() == "true"
    if not reliable:
        out = df.localCheckpoint(eager=eager)
        if _capture_out is not None:
            _capture_out.append(out)
        return out
    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        ckpt_dir = spark.conf.get(DIR_CONF, None)
        if not ckpt_dir:
            raise ValueError(
                f"{RELIABLE_CONF}=true but no checkpoint dir: call "
                f"setCheckpointDir(...) or set {DIR_CONF}"
            )
        sc.setCheckpointDir(ckpt_dir)
    out = df.checkpoint(eager=eager)
    if _capture_out is not None:
        _capture_out.append(out)
    return out


def cut_lineage_eager(df: DataFrame) -> DataFrame:
    """Eager variant for iterative loops (Lloyd rounds, pagerank seeds)."""
    return cut_lineage(df, eager=True)
