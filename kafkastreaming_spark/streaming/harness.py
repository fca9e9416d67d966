"""Streaming replay harness (SURVEY.md §5.2 layer 3).

Replays the bounded events table as a genuine multi-micro-batch stream:

1. sort events by ts, split into N parquet chunk files (arrival order);
   optionally displace a slice of mid-timeline rows into the final chunk
   to create *late* arrivals for watermark tests;
2. ``file_event_stream`` reads the chunk dir with maxFilesPerTrigger=1;
3. ``run_to_memory`` executes with Trigger.AvailableNow — Spark processes
   chunk-by-chunk (real incremental state, real watermark advancement),
   then stops — and returns the memory-sink table.

This is how watermark/late-data/stateful semantics are verified without a
Kafka broker (none exists in this sandbox — SURVEY.md §7.5).
"""

from __future__ import annotations

import contextlib
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreaming_spark.io import load_table
from kafkastreaming_spark.sources.factory import file_event_stream

# chunk dirs already built by THIS process: (path,) -> reuse
_REPLAY_BUILT: set[tuple] = set()


def scratch_dir() -> str:
    """Scratch root for harness artifacts (replay chunk dirs, streaming
    checkpoints, staging sinks).  Override with SPARK_GRAFT_SCRATCH.

    Default is the system tempdir, NOT tmpfs — measured r13: a tmpfs
    (/dev/shm) default was A/B-flat in a fresh process (per-lifecycle
    checkpoint I/O is buffered small writes either way, never fsync-
    bound) but 25-60% SLOWER for the Python-stateful and stateful
    streaming keys inside a long bench session, where tmpfs page
    allocation competes with the parquet page cache under memory
    pressure (harness section 55.9 s on /dev/shm vs 44.9 s on /tmp,
    clean canaries both, byte-identical code).  Checkpoint semantics
    are medium-independent; on a real cluster checkpoints belong on
    HDFS/object storage — this knob tunes the single-box replay
    HARNESS, not the operator."""
    cand = os.environ.get("SPARK_GRAFT_SCRATCH")
    if cand and os.path.isdir(cand) and os.access(cand, os.W_OK):
        return cand
    return tempfile.gettempdir()

# State/shuffle partition count for replay streaming queries.  Streaming
# state stores cost O(partitions) per micro-batch per stateful operator
# (provider init, snapshot/delta files, commit) regardless of data
# volume, and AQE is disabled in streaming so nothing coalesces the
# session's batch-sized 32 back down.  You size state partitions for
# state VOLUME: the replay fixtures carry ≤100k rows of state, where 8
# partitions keep every core busy inside one wave while cutting the
# fixed per-batch state-store overhead 4× (r11, VERDICT r10 item 2 —
# stream_stream_join/_outer were 13.1 s each with 32-partition state).
# At 100 TB you'd raise spark.sql.shuffle.partitions (or use RocksDB +
# more partitions) — this knob tunes the HARNESS, not the operator.
_STREAM_SHUFFLE = int(os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8"))

# State-volume threshold above which the harness stops trusting the
# low-overhead replay default and sizes state partitions to the machine
# (VERDICT r14 item 3, promoting the r14 100x-probe finding from a
# docstring to a tested default).  The probe's A/B at 10M events through
# stream_session_ttl measured 447 s at 32 partitions vs 1270-1348 s at 8
# in fresh processes: once per-group state compute dominates the fixed
# per-partition state-store overhead, fewer-partitions-than-cores is a
# 3x loss.  Replay fixtures (<=100k state rows) stay on _STREAM_SHUFFLE.
_STATE_VOLUME_THRESHOLD = int(
    os.environ.get("SPARK_GRAFT_STATE_VOLUME_THRESHOLD", "1000000")
)


def state_partitions(state_groups: int | None, cores: int | None = None) -> int:
    """State-partition count for a stateful streaming lifecycle, derived
    from expected STATE VOLUME (``state_groups`` = rows/groups the state
    store will track; pass the best estimate available, e.g. distinct
    keys x windows).

    Below :data:`_STATE_VOLUME_THRESHOLD` the fixed per-partition
    per-micro-batch state-store cost (provider init, snapshot/delta
    files, commit) dominates, so the swept harness default
    :data:`_STREAM_SHUFFLE` (8) wins.  At or above it, per-group state
    compute dominates and the rule flips to >= one partition per core —
    the r14 100x probe measured the flip at 3x (447 s @32 vs
    1270-1348 s @8 for 10M events / ~150k Python-stateful groups).
    ``None`` state volume means "unknown, assume replay-sized"."""
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (
            os.cpu_count() or _STREAM_SHUFFLE
        )
    if state_groups is not None and state_groups >= _STATE_VOLUME_THRESHOLD:
        return max(cores, _STREAM_SHUFFLE)
    return _STREAM_SHUFFLE


@contextlib.contextmanager
def stream_shuffle(spark: SparkSession, n: int | None = None):
    """Scope spark.sql.shuffle.partitions to ``n`` (default
    _STREAM_SHUFFLE) for the duration of a streaming query lifecycle
    (set → start → awaitTermination → restore).  Safe because every
    harness query runs synchronously (AvailableNow + awaitTermination)
    and each uses a fresh checkpoint, so the captured partition count
    never conflicts with a prior run.

    Per-key overrides (r12 sweep, VERDICT r11 item 7 — 4/8/16/32 probed
    per key at sf0.1): the Python-stateful ``stream_session_ttl`` wins
    at 16 (more Arrow workers in flight beats per-batch state-store
    overhead: 6.2 s vs 6.7 s at 8, 9.6 s at 4), while the pure-JVM
    3-lifecycle ``stream_late_update`` wins at 4 (fixed per-partition
    state-store cost × 3 lifecycles dominates: 5.3 s vs 5.6 s at 8,
    12.0 s at 32).  Everything else keeps the fleet-swept default 8."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n or _STREAM_SHUFFLE))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def replay_chunks(
    spark: SparkSession,
    sf_dir: str,
    n_chunks: int = 6,
    late_fraction: float = 0.0,
    tag: str = "replay",
) -> str:
    """Write events as n_chunks arrival-ordered parquet files; optionally
    move a slice of mid-timeline rows into the last chunk (late data).
    Returns the chunk directory.

    The replay is a pure function of (sf_dir, n_chunks, late_fraction) —
    every streaming key reads the same events table — so the chunk dir
    is built ONCE per (process, params) and shared across keys, queries
    (each has its own checkpoint), and bench repeats.  Before this memo
    the rows-only bench paid a toPandas + parquet rewrite per
    invocation: ~12 rewrites of the full events table per repeat at
    sf0.1 (r8 roadmap item).  ``tag`` is kept for API compatibility but
    no longer differentiates storage."""
    del tag  # shared storage: content depends only on the params below
    out = os.path.join(
        scratch_dir(),
        "ks_stream_shared_"
        f"{os.path.basename(sf_dir.rstrip('/'))}_{n_chunks}"
        f"_{int(late_fraction * 10_000)}_{os.getpid()}",
    )
    if (out, ) in _REPLAY_BUILT:
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    ev = load_table(spark, sf_dir, "events").orderBy("ts", "event_id")
    rows_per_chunk = ev.count() // n_chunks + 1
    pdf = ev.toPandas()
    late = None
    if late_fraction > 0:
        # displace rows from the 2nd chunk to arrive last → late by most of
        # the timeline, far beyond any reasonable watermark delay
        lo, hi = rows_per_chunk, rows_per_chunk + int(len(pdf) * late_fraction)
        late = pdf.iloc[lo:hi]
        pdf = pdf.drop(pdf.index[lo:hi])
    for i in range(n_chunks):
        chunk = pdf.iloc[i * rows_per_chunk : (i + 1) * rows_per_chunk]
        if len(chunk) == 0:
            continue
        chunk.to_parquet(
            os.path.join(out, f"chunk_{i:03d}.parquet"),
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
    if late is not None and len(late):
        late.to_parquet(
            os.path.join(out, "chunk_999_late.parquet"),
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
    _REPLAY_BUILT.add((out,))
    return out


# memory-sink temp views registered by run_to_memory, oldest first —
# each holds its full result rows on the driver until dropped
_SINK_TABLES: list[str] = []


def release_sinks(spark: SparkSession, keep: int = 4) -> int:
    """Drop memory-sink temp views registered by earlier
    :func:`run_to_memory` calls, keeping the newest ``keep``.

    A memory sink retains its full result rows on the driver for as
    long as its temp view exists; a long session that runs many
    streaming lifecycles (bench: ~30 keys × 4 runs) otherwise
    accumulates every sink ever produced.  Callers that have fully
    materialized the frames a key returned (bench between keys, the
    verifier between keys) can release all but the newest few — frames
    from dropped views fail loudly on re-use, never silently.  Returns
    the number of views dropped."""
    dropped = 0
    while len(_SINK_TABLES) > max(keep, 0):
        name = _SINK_TABLES.pop(0)
        try:
            spark.catalog.dropTempView(name)
            dropped += 1
        except Exception:  # noqa: BLE001 — already gone is fine
            pass
    return dropped


def run_to_memory(
    sdf: DataFrame,
    output_mode: str = "append",
    timeout_sec: int = 120,
    shuffle_n: int | None = None,
    no_data_batches: bool = True,
    state_groups: int | None = None,
) -> DataFrame:
    """Execute a streaming DataFrame to completion (AvailableNow) into a
    memory sink; returns the sink table as a batch DataFrame.
    ``shuffle_n`` forwards a per-key state-partition override to
    :func:`stream_shuffle` (see its sweep table).  When ``shuffle_n`` is
    None, ``state_groups`` (expected state-store volume) picks the
    default via :func:`state_partitions` — replay-sized state keeps the
    swept 8, >=threshold state sizes to the machine (r14 100x A/B:
    3x faster at one partition per core).

    ``no_data_batches=False`` scopes
    ``spark.sql.streaming.noDataMicroBatches.enabled=false`` to this
    lifecycle: the trailing zero-row micro-batch exists ONLY to advance
    the watermark and fire state evictions/timeouts after the last data
    batch — operators whose evictions EMIT (outer joins, session
    timeouts, append-mode window finalization) need it; operators whose
    evictions are output-silent (inner stream-stream join: eviction
    just drops matched state) pay its full state-store-commit floor
    (~0.7-0.9 s at 8 partitions × 4 join stores, r13 profile: an EMPTY
    batch costs addBatch≈712 ms) for nothing.  Only pass False when the
    final sink is provably independent of the trailing batch.

    Concurrency caveat (ADVICE r13): the toggle is a SESSION conf saved
    and restored around this one lifecycle — Structured Streaming has no
    per-query spelling for it — so any OTHER streaming query started on
    the same session during the window silently inherits the disabled
    trailing batch.  This harness runs one query at a time (bench /
    verifier / tests are single-threaded per session); callers embedding
    it elsewhere must keep that single-query-at-a-time assumption or
    leave ``no_data_batches=True``."""
    if shuffle_n is None:
        shuffle_n = state_partitions(state_groups)
    name = f"sink_{uuid.uuid4().hex[:12]}"
    ckpt = os.path.join(scratch_dir(), f"ks_ckpt_{name}")
    spark_ = sdf.sparkSession
    ndb_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    ndb_old = spark_.conf.get(ndb_key, "true")
    if not no_data_batches:
        spark_.conf.set(ndb_key, "false")
    try:
        return _run_to_memory_inner(
            sdf, output_mode, timeout_sec, shuffle_n, name, ckpt
        )
    finally:
        spark_.conf.set(ndb_key, ndb_old)


def _run_to_memory_inner(
    sdf: DataFrame,
    output_mode: str,
    timeout_sec: int,
    shuffle_n: int | None,
    name: str,
    ckpt: str,
) -> DataFrame:
    with stream_shuffle(sdf.sparkSession, shuffle_n):
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(timeout_sec)
            if not finished:
                raise TimeoutError(
                    f"streaming query {name} did not finish in {timeout_sec}s — "
                    "refusing to return a partial memory sink"
                )
        finally:
            if q.isActive:
                q.stop()
    spark = sdf.sparkSession
    result = spark.table(name)
    _SINK_TABLES.append(name)
    shutil.rmtree(ckpt, ignore_errors=True)
    return result


def stream_events(
    spark: SparkSession,
    sf_dir: str,
    n_chunks: int = 6,
    late_fraction: float = 0.0,
    tag: str = "replay",
) -> DataFrame:
    """Convenience: chunked replay of the events table as a streaming DF."""
    chunk_dir = replay_chunks(spark, sf_dir, n_chunks, late_fraction, tag)
    return file_event_stream(spark, chunk_dir)


def console_sink(
    sdf: DataFrame,
    num_rows: int = 5,
    timeout_sec: int = 60,
    state_groups: int | None = None,
) -> None:
    """Console sink (operational debugging sink; SURVEY.md §2.1).

    ``state_groups`` (expected state-store volume) sizes state partitions
    via :func:`state_partitions`, exactly like :func:`run_to_memory` —
    replay-sized state keeps the swept 8-partition default, >=threshold
    state sizes to the machine (ADVICE r15: previously only run_to_memory
    had this, so large-state lifecycles through this sink silently kept
    the 3x-slow small-state default)."""
    name = f"console_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(scratch_dir(), f"ks_ckpt_{name}")
    with stream_shuffle(sdf.sparkSession, state_partitions(state_groups)):
        q = (
            sdf.writeStream.format("console")
            .option("numRows", str(num_rows))
            .option("truncate", "true")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout_sec)
        finally:
            if q.isActive:
                q.stop()
            shutil.rmtree(ckpt, ignore_errors=True)


def foreach_batch_collect(
    sdf: DataFrame, timeout_sec: int = 120, state_groups: int | None = None
) -> list:
    """foreachBatch sink: collects (batch_id, row_count) per micro-batch —
    the arbitrary-sink escape hatch (JDBC/object-store writes in prod).

    ``state_groups`` sizes state partitions via :func:`state_partitions`,
    matching :func:`run_to_memory` (ADVICE r15 — see :func:`console_sink`)."""
    seen: list = []

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        seen.append((batch_id, batch_df.count()))

    name = f"feb_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(scratch_dir(), f"ks_ckpt_{name}")
    with stream_shuffle(sdf.sparkSession, state_partitions(state_groups)):
        q = (
            sdf.writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(timeout_sec)
            if not finished:
                raise TimeoutError(
                    f"foreachBatch query {name} did not finish in "
                    f"{timeout_sec}s — refusing to return a partial batch log"
                )
        finally:
            if q.isActive:
                q.stop()
            shutil.rmtree(ckpt, ignore_errors=True)
    return seen
