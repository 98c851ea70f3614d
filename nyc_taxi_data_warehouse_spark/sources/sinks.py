"""Sinks (SURVEY §2.1) — the 100 TB-aware replacements for the reference's
CSV-détour + Snowflake stage pipeline.

The reference writes `coalesce(1)` single-file CSV then PUT/COPYs it into
Snowflake (`dags/etl_spark_historical.py:199-207,319-347`) — an anti-scale
choice called out in SURVEY §4. The engine's native path is date-partitioned
parquet: partition pruning makes every time-ranged query skip irrelevant
files, and writers parallelize per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned_by_date(
    df: DataFrame,
    path: str,
    ts_col: str,
    mode: str = "overwrite",
    date_col: str = "p_date",
) -> None:
    """Lake-table write partitioned by event date — the engine's fact-table
    layout. At 100 TB this yields ~1 partition/day/shuffle-task; combine with
    AQE coalescing to avoid small files."""
    (
        df.withColumn(date_col, F.to_date(ts_col))
        .write.mode(mode)
        .partitionBy(date_col)
        .parquet(path)
    )


def overwrite_date_partitions(
    df: DataFrame,
    path: str,
    ts_col: str,
    date_col: str = "p_date",
) -> None:
    """Incremental mart refresh (the reference lists 'incremental models' as
    future work — `README.md:375`): dynamic partition overwrite replaces
    ONLY the date partitions present in `df`, leaving every other partition
    untouched. This is how a daily transform reprocesses late-arriving days
    at 100 TB without rewriting the table."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.withColumn(date_col, F.to_date(ts_col))
            .write.mode("overwrite")
            .partitionBy(date_col)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_single_csv(df: DataFrame, path: str) -> None:
    """Reference-compat single-file CSV sink (S4,
    `dags/etl_spark_historical.py:199-207`). Kept only for parity/export of
    small results — scale path is :func:`write_partitioned_by_date`."""
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("header", "true")
        # quote-doubling escape, matching the stage file format the reference
        # COPYs with (S5: FIELD_OPTIONALLY_ENCLOSED_BY='"') and our reader
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def append(df: DataFrame, path: str) -> None:
    """Append-mode event sink (weather feed, S12)."""
    df.write.mode("append").parquet(path)


def compact(spark, path: str, target_files: int) -> int:
    """Small-files compaction: rewrite a table directory down to
    `target_files` files (hourly appends leave one tiny file per batch; at
    scale the metadata and open-cost of millions of small files dominates
    scan time). Uses the :func:`atomic_overwrite` stage/rename protocol, so
    readers never observe a missing or partial table and a mid-rewrite crash
    is recoverable. Returns the resulting file count."""
    df = spark.read.parquet(path).repartition(target_files)
    atomic_overwrite(df, path.rstrip("/"))
    return len(spark.read.parquet(path).inputFiles())


_STAGE_SUFFIX = ".__stage"
_GC_SUFFIX = ".__gc"
_LEASE_SUFFIX = ".__lease"


class LeaseHeldError(RuntimeError):
    """Another writer holds a live lease on the table path."""


class WriterLease:
    """Single-writer lease for a path-based table — the concurrency half of
    :func:`atomic_overwrite`'s transactionality (the reference gets both
    from a Snowflake transaction, `dags/etl_spark_historical.py:292,349-386`;
    a filesystem lake has to build them).

    Protocol (rename-atomic filesystems, same assumption as
    :func:`atomic_overwrite`):

    - acquire: ``O_CREAT|O_EXCL`` create of ``<path>.__lease`` holding
      ``{token, owner, pid, expires_at}`` — atomic, exactly one creator
      wins.  A loser whose rival's lease is still live raises
      :class:`LeaseHeldError` cleanly, having touched nothing.
    - stale takeover: a lease past ``expires_at`` (writer crashed mid-swap)
      is broken by renaming it aside — rename is atomic, so of N racing
      takeover attempts exactly one wins and the rest loop back to a fresh
      acquire attempt.
    - release: unlink only if the file still carries OUR token (we may have
      been timed out and taken over while paused — then the lease is no
      longer ours to remove).

    TTL is a liveness/correctness trade: it must exceed the longest
    stage-write + rename window or a slow writer can be usurped mid-swap.
    At cluster scale prefer a heartbeat (re-write expires_at periodically)
    or a real table format (Delta/Iceberg optimistic commit) — interfaces
    here stay storage-agnostic so those can slot in.
    """

    def __init__(self, path: str, owner: str | None = None, ttl_seconds: float = 600.0):
        import os
        import uuid

        self.lock_path = path + _LEASE_SUFFIX
        self.owner = owner or f"pid-{os.getpid()}"
        self.ttl = float(ttl_seconds)
        self.token = uuid.uuid4().hex
        self._held = False

    def _read(self) -> dict | None:
        import json

        try:
            with open(self.lock_path) as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return None

    def acquire(self) -> "WriterLease":
        import json
        import os
        import time

        while True:
            try:
                fd = os.open(self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                cur = self._read()
                if cur is None:
                    continue  # holder released between our open and read
                if cur.get("expires_at", 0) > time.time():
                    raise LeaseHeldError(
                        f"{self.lock_path} held by {cur.get('owner')} "
                        f"until {cur.get('expires_at')}"
                    )
                # stale: break it by renaming aside — atomic, one winner
                try:
                    os.rename(self.lock_path, self.lock_path + "." + self.token)
                    os.unlink(self.lock_path + "." + self.token)
                except FileNotFoundError:
                    pass  # a rival takeover won; loop and re-try acquire
                continue
            with os.fdopen(fd, "w") as f:
                json.dump(
                    {
                        "token": self.token,
                        "owner": self.owner,
                        "pid": os.getpid(),
                        "expires_at": time.time() + self.ttl,
                    },
                    f,
                )
                f.flush()
                os.fsync(f.fileno())
            self._held = True
            return self

    def release(self) -> None:
        import os

        if not self._held:
            return
        cur = self._read()
        if cur is not None and cur.get("token") == self.token:
            try:
                os.unlink(self.lock_path)
            except FileNotFoundError:
                pass
        self._held = False

    def __enter__(self) -> "WriterLease":
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()


def atomic_overwrite(
    df: DataFrame,
    path: str,
    lease_ttl: float | None = 600.0,
    owner: str | None = None,
) -> None:
    """Transactional table replace for a path-based parquet table — the
    engine's stand-in for the atomicity of the reference's Snowflake
    ``MERGE INTO`` (`dags/etl_spark_historical.py:349-380`).

    Protocol (rename-atomic filesystems: POSIX, HDFS):

    1. write the complete new image to ``<path>.__stage`` — a crash here
       leaves the live table untouched;
    2. rename live → ``<path>.__gc``  (atomic);
    3. rename stage → live           (atomic);
    4. drop the old image.

    Readers observe either the old or the new complete table, never a
    partial write. A crash between 2 and 3 leaves no live directory but
    both images intact — :func:`recover_atomic_overwrite` repairs it.
    Because the new image is written while the old files still exist, the
    input DataFrame MAY read from ``path`` itself (read-merge-overwrite),
    which a plain ``mode("overwrite")`` to the same path cannot do.
    Object stores without atomic rename need a manifest/table format
    (Delta/Iceberg) — these operator interfaces stay storage-agnostic so
    that can slot in.

    Concurrency: the whole protocol runs under a :class:`WriterLease`
    (``lease_ttl`` seconds; ``None`` disables for single-writer callers).
    A concurrent writer raises :class:`LeaseHeldError` before writing
    anything, so racing jobs can never interleave their renames and
    last-rename-wins data loss cannot occur. A writer that dies holding
    the lease leaves a stale file the next writer takes over after TTL.
    """
    import os
    import shutil

    lease = (
        WriterLease(path, owner=owner, ttl_seconds=lease_ttl).acquire()
        if lease_ttl is not None
        else None
    )
    try:
        stage, gc = path + _STAGE_SUFFIX, path + _GC_SUFFIX
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(gc, ignore_errors=True)
        try:
            df.write.mode("overwrite").parquet(stage)
        except Exception:
            shutil.rmtree(stage, ignore_errors=True)
            raise
        if not os.path.exists(os.path.join(stage, "_SUCCESS")):
            shutil.rmtree(stage, ignore_errors=True)
            raise RuntimeError(f"stage write of {path} finished without _SUCCESS")
        if os.path.exists(path):
            os.rename(path, gc)
        os.rename(stage, path)
        shutil.rmtree(gc, ignore_errors=True)
    finally:
        if lease is not None:
            lease.release()


def recover_atomic_overwrite(path: str, lease_ttl: float | None = 600.0) -> str:
    """Repair an interrupted :func:`atomic_overwrite`. Returns the action
    taken: ``'promoted-stage'`` (crash after the live table was moved aside
    and the stage image is complete), ``'restored-old'`` (stage incomplete),
    or ``'noop'`` (live table present).

    Recovery takes the same :class:`WriterLease` as the writer (a crashed
    writer's stale lease falls to TTL takeover): repairing while a LIVE
    writer is mid-swap would wrongly judge its in-flight stage/gc images.
    A live lease therefore raises :class:`LeaseHeldError` — retry after the
    writer finishes or its lease expires."""
    import os
    import shutil

    lease = (
        WriterLease(path, owner="recovery", ttl_seconds=lease_ttl).acquire()
        if lease_ttl is not None
        else None
    )
    try:
        stage, gc = path + _STAGE_SUFFIX, path + _GC_SUFFIX
        if os.path.exists(path):
            shutil.rmtree(stage, ignore_errors=True)
            shutil.rmtree(gc, ignore_errors=True)
            return "noop"
        if os.path.exists(os.path.join(stage, "_SUCCESS")):
            os.rename(stage, path)
            shutil.rmtree(gc, ignore_errors=True)
            return "promoted-stage"
        if os.path.exists(gc):
            os.rename(gc, path)
            shutil.rmtree(stage, ignore_errors=True)
            return "restored-old"
        raise FileNotFoundError(f"no live, stage, or gc image for {path}")
    finally:
        if lease is not None:
            lease.release()


def read_with_schema_evolution(spark, path: str) -> DataFrame:
    """Union-schema read across files written at different schema versions
    (`mergeSchema`): late-added columns surface as NULL for old files —
    the append-only lake's answer to ALTER TABLE ADD COLUMN."""
    return spark.read.option("mergeSchema", "true").parquet(path)
