"""Versioned parquet tables: minimal snapshot time travel.

The lakehouse time-travel primitive (Delta/Iceberg ``VERSION AS OF``) in
its smallest honest form: every commit writes a full snapshot into an
immutable ``v=<n>`` directory and then atomically publishes it by
rewriting a tiny ``_VERSIONS.json`` manifest (write-temp + ``os.replace``
— readers either see the old manifest or the new one, never a torn
file).  Reads resolve a version (or latest) through the manifest only,
so any number of concurrent READERS are safe against a single writer.
Writers must be externally serialized (one committer at a time): the
commit is a read-modify-write of the manifest with last-writer-wins
``os.replace`` semantics, so two simultaneous writers could mint the
same version number or drop each other's entry — the same single-
committer contract Delta's non-transactional stores (e.g. plain S3
pre-S3A-committers) impose.  :func:`write_version` enforces it cheaply
with an ``O_EXCL`` lockfile and fails loudly on contention rather than
corrupting the manifest.

Scale notes: snapshots are copy-on-write full rewrites — right for
dimension/result tables and bounded-size curated sets; fact-scale tables
want partition-level manifests (the same pattern one level down).  The
manifest is O(versions) and driver-side by design, like any catalog
pointer.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(table_path: str) -> str:
    return os.path.join(table_path, "_VERSIONS.json")


def _load_manifest(table_path: str) -> dict:
    p = _manifest_path(table_path)
    if not os.path.exists(p):
        return {"versions": []}
    with open(p) as f:
        return json.load(f)


def write_version(df: DataFrame, table_path: str, note: str = "") -> int:
    """Commit ``df`` as the next version of the table; returns the new
    version number (1-based).

    Single-committer contract: the whole commit (version-number mint →
    snapshot write → manifest publish) runs under an ``O_EXCL`` lockfile.
    A second concurrent committer fails loudly with RuntimeError instead
    of silently minting a duplicate version or dropping the other
    writer's manifest entry."""
    os.makedirs(table_path, exist_ok=True)
    lock = os.path.join(table_path, "_COMMIT_LOCK")
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise RuntimeError(
            f"concurrent commit in progress on {table_path} "
            f"(lockfile {lock} exists; remove it only if its owner died)"
        ) from None
    try:
        man = _load_manifest(table_path)
        version = (man["versions"][-1]["version"] + 1) if man["versions"] else 1
        vdir = os.path.join(table_path, f"v={version}")
        # Crash-safe snapshot write: stage into a temp dir, rename into
        # place only on success.  A writer that dies mid-parquet-write
        # leaves only an unreferenced ``_staging`` dir — the next commit
        # (which re-mints the same version number, since the manifest
        # never advanced) sweeps it and proceeds.  Before this, a partial
        # ``v=<n>`` dir wedged every future commit on ``errorifexists``.
        staging = vdir + "._staging"
        if os.path.isdir(staging):  # leftover from a dead writer
            import shutil

            shutil.rmtree(staging)
        if os.path.isdir(vdir):
            # orphan from a pre-staging crash (written but never
            # published): unreferenced by the manifest, safe to sweep
            # under the commit lock
            import shutil

            shutil.rmtree(vdir)
        df.write.mode("errorifexists").parquet(staging)
        os.rename(staging, vdir)  # atomic on one filesystem
        man["versions"].append(
            {"version": version, "dir": f"v={version}", "note": note,
             "committed_at": time.time()}
        )
        tmp = _manifest_path(table_path) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=2)
        os.replace(tmp, _manifest_path(table_path))  # atomic publish
    finally:
        os.close(fd)
        os.unlink(lock)
    return version


def list_versions(table_path: str) -> list[dict]:
    return _load_manifest(table_path)["versions"]


def read_as_of(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Read the table at ``version`` (or the latest when ``None``)."""
    man = _load_manifest(table_path)
    if not man["versions"]:
        raise ValueError(f"no committed versions under {table_path}")
    if version is None:
        entry = man["versions"][-1]
    else:
        matches = [v for v in man["versions"] if v["version"] == version]
        if not matches:
            known = [v["version"] for v in man["versions"]]
            raise ValueError(f"version {version} not found (have {known})")
        entry = matches[0]
    return spark.read.parquet(os.path.join(table_path, entry["dir"]))


def table_changes(
    spark: SparkSession,
    table_path: str,
    v_from: int,
    v_to: int,
    key_cols: list[str],
) -> DataFrame:
    """Change data feed between two committed versions (Delta
    ``table_changes`` in minimal form): full outer join the snapshots on
    the key and classify every row as insert / delete / update /
    unchanged — the diff a downstream incremental consumer replays
    instead of re-reading the whole table.

    Scale shape: ONE shuffle per side on the key (sort-merge or
    AQE-chosen hash join); the value comparison is a null-safe conjunction
    evaluated inside the join's whole-stage-codegen project, so cost is
    O(|v_from| + |v_to|) with no driver materialization.  Column sets may
    differ between versions (schema evolution): compared columns are the
    intersection, columns only in ``v_to`` count toward "update".
    """
    from pyspark.sql import functions as F

    old = read_as_of(spark, table_path, v_from)
    new = read_as_of(spark, table_path, v_to)
    shared = [c for c in old.columns if c in set(new.columns) and c not in key_cols]
    extra_new = [c for c in new.columns if c not in old.columns]
    o = old.select(
        *[F.col(k).alias(f"_k_{k}") for k in key_cols],
        F.struct(*[F.col(c) for c in shared]).alias("old"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_k_{k}") for k in key_cols],
        F.struct(*[F.col(c) for c in shared + extra_new]).alias("new"),
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, [f"_k_{k}" for k in key_cols], "full_outer")
    same_vals = F.lit(True)
    for c in shared:
        same_vals = same_vals & F.col("old")[c].eqNullSafe(F.col("new")[c])
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(same_vals & F.lit(not extra_new), F.lit("unchanged"))
        .otherwise(F.lit("update"))
    )
    return j.select(
        *[F.col(f"_k_{k}").alias(k) for k in key_cols],
        change.alias("change_type"),
        "old",
        "new",
    )


def vacuum_versions(table_path: str, keep_last: int = 2) -> list[int]:
    """Retire old snapshots: atomically publish a manifest containing only
    the newest ``keep_last`` versions, THEN delete the retired ``v=<n>``
    directories.  Publish-first/delete-second guarantees that any reader
    resolving the manifest AFTER the publish can never reference a
    deleted snapshot.  It does NOT protect a reader that resolved the
    OLD manifest and is still scanning a retired directory when the
    delete lands — that reader can hit missing files mid-scan.  Closing
    that window needs a retention delay (delete only snapshots retired
    more than T ago, with T above the max query runtime) — exactly why
    Delta's VACUUM defaults to a 7-day retention window; this minimal
    form deletes immediately and is safe only when callers quiesce
    readers of retired versions first.  Runs under the same
    single-committer lockfile as ``write_version``.  Returns the retired
    version numbers."""
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (cannot vacuum every version)")
    lock = os.path.join(table_path, "_COMMIT_LOCK")
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise RuntimeError(
            f"concurrent commit in progress on {table_path}"
        ) from None
    try:
        man = _load_manifest(table_path)
        keep = man["versions"][-keep_last:]
        retired = [v for v in man["versions"] if v not in keep]
        if not retired:
            return []
        tmp = _manifest_path(table_path) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"versions": keep}, f, indent=2)
        os.replace(tmp, _manifest_path(table_path))  # publish first
        for v in retired:  # then delete unreferenced snapshot dirs
            shutil.rmtree(os.path.join(table_path, v["dir"]), ignore_errors=True)
        return [v["version"] for v in retired]
    finally:
        os.close(fd)
        os.unlink(lock)
