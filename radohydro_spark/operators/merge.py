"""MERGE INTO semantics as a DataFrame operator (upsert / delete).

The copy-on-write table-maintenance primitive: reconcile a target snapshot
with a change batch in one pass —

    matched  + no delete flag  -> source values win (UPDATE)
    matched  + delete flag     -> row dropped       (DELETE)
    source-only                -> row added          (INSERT)
    target-only                -> row kept unchanged

Plan shape: ONE full-outer shuffle join on the keys (sort-merge at scale;
AQE turns it into a broadcast variant when the change batch is small).
With a bucketed target (sinks/bucketed.py) the target side's exchange
disappears entirely — the standard layout for repeated merges at 100 TB.

Cite: the reference has no mutation surface at all (files in, files out);
this is engine-native extension territory (SURVEY.md §7.2 step 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MARK = "__src_present"


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Merge ``source`` changes into ``target`` by ``keys``.

    Source columns overwrite same-named target columns on match; target
    columns absent from the source pass through (NULL on inserts).
    ``delete_col``: boolean column in ``source`` marking rows to remove;
    it never appears in the output.
    """
    src_vals = [c for c in source.columns if c not in keys and c != delete_col]
    tgt_vals = [c for c in target.columns if c not in keys]

    renamed = source.select(
        *keys,
        *[F.col(c).alias(f"{c}{_MARK}") for c in src_vals],
        *([F.col(delete_col).alias(f"__del{_MARK}")] if delete_col else []),
        F.lit(1).alias(_MARK),
    )
    j = target.join(renamed, keys, "full_outer")
    if delete_col:
        j = j.filter(
            ~((F.col(_MARK) == 1) & F.coalesce(F.col(f"__del{_MARK}"), F.lit(False)))
        )

    matched = F.col(_MARK) == 1
    out_cols = [F.col(k) for k in keys]
    emitted = set(keys)
    for c in tgt_vals:
        if c in src_vals:
            out_cols.append(
                F.when(matched, F.col(f"{c}{_MARK}")).otherwise(F.col(c)).alias(c)
            )
        else:
            out_cols.append(F.col(c))
        emitted.add(c)
    for c in src_vals:
        if c not in emitted:  # source-only column: NULL for unmatched target rows
            out_cols.append(
                F.when(matched, F.col(f"{c}{_MARK}"))
                .otherwise(F.lit(None))
                .alias(c)
            )
    return j.select(*out_cols)


def merge_rollup(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Incremental aggregate maintenance: fold a delta batch's partial
    rollup into an existing rollup WITHOUT rescanning history.

    Works for any decomposable aggregate carried as sums (counts are
    sums of 1s; avg = sum/count at read time): ``unionByName`` the two
    partial states and re-sum per key — associativity of the partial
    aggregate is exactly what Spark's own map-side combine relies on, so
    the merged result is bit-identical to a full recompute (asserted by
    the driver oracle).  Cost is O(|rollup| + |delta rollup|), never
    O(history); both inputs arrive pre-aggregated so the shuffle carries
    group rows, not events.
    """
    return (
        base.select(*keys, *sum_cols)
        .unionByName(delta.select(*keys, *sum_cols))
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data-capture between two table snapshots: one full-outer
    join on the key emits ``insert`` (key only in new), ``delete`` (key
    only in old), and ``update`` (any compared column differs,
    NULL-safely); unchanged rows are filtered out so the result is
    delta-sized.  The single key-shuffle is the whole cost — this is the
    diff that feeds ``merge_upsert`` when a source system only ships full
    snapshots.

    Returns ``keys + change_type`` plus the NEW values of
    ``compare_cols`` (NULL for deletes).
    """
    compare_cols = compare_cols or [
        c for c in new.columns if c not in keys
    ]
    # literal presence markers survive all-NULL payload columns
    o = old.select(
        *keys,
        F.lit(1).alias("_old_present"),
        *[F.col(c).alias(f"_old_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(1).alias("_new_present"),
        *[F.col(c).alias(f"_new_{c}") for c in compare_cols],
    )
    j = o.join(n, keys, "full_outer")
    changed = F.lit(False)  # key-only tables: membership changes only
    for c in compare_cols:
        ne = ~(F.col(f"_old_{c}").eqNullSafe(F.col(f"_new_{c}")))
        changed = changed | ne
    change_type = (
        F.when(F.col("_old_present").isNull(), F.lit("insert"))
        .when(F.col("_new_present").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    out = j.withColumn("change_type", change_type).filter(
        F.col("change_type").isNotNull()
    )
    return out.select(
        *keys,
        "change_type",
        *[F.col(f"_new_{c}").alias(c) for c in compare_cols],
    )


def apply_changes(
    old: DataFrame,
    changes: DataFrame,
    keys: list[str],
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Apply a CDC change feed (``keys + change_type + new payload
    values``, the exact shape ``snapshot_diff`` emits) onto a snapshot —
    the replay half of snapshot-based CDC: ``apply_changes(v1,
    snapshot_diff(v1, v2, keys), keys) == v2``.

    * ``delete`` rows drop the key, ``update`` rows overwrite the payload
      columns, ``insert`` rows append (payload columns only — any extra
      snapshot columns outside ``keys + payload_cols`` surface as NULL on
      inserted rows, since a diff feed doesn't carry them).
    * Cost model: ONE key-shuffle join of the snapshot against the
      delta-sized feed (AQE broadcasts the feed side at runtime when it
      fits) plus a union of the feed's inserts — the snapshot is never
      shuffled twice.
    """
    payload_cols = payload_cols or [
        c for c in changes.columns if c not in keys + ["change_type"]
    ]
    ch = changes.select(
        *keys,
        "change_type",
        *[F.col(c).alias(f"_ch_{c}") for c in payload_cols],
    )
    j = old.join(ch, keys, "left_outer")
    survivors = j.filter(
        F.col("change_type").isNull() | (F.col("change_type") != "delete")
    ).select(
        *keys,
        *[
            (
                F.when(
                    F.col("change_type") == "update", F.col(f"_ch_{c}")
                ).otherwise(F.col(c))
                if c in payload_cols
                else F.col(c)
            ).alias(c)
            for c in old.columns
            if c not in keys
        ],
    )
    inserts = changes.filter(F.col("change_type") == "insert").select(
        *keys,
        *[
            (F.col(c) if c in payload_cols else F.lit(None)).alias(c)
            for c in old.columns
            if c not in keys
        ],
    )
    return survivors.unionByName(inserts)
