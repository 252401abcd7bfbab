"""Custom Python Data Source (Spark 4 DataSource API): the synthetic
RADOLAN-style observation grid as a first-class ``spark.read.format(
"radohydro_grid")`` source.

This is the extensibility surface a production deployment would use to
mount the DWD mirror itself as a catalog-addressable format (list the
archive in ``partitions()``, fetch+decode in ``read()``) instead of the
manifest-DataFrame plumbing in ``sources/manifest.py`` — the harness
instance generates the closed-form grid (same VALUE/NULL law as
``synthetic_obs`` / the DuckDB oracle CTEs, sources/synthetic.py:54-56)
so the driver can value-verify the whole path.

Partition planning is REAL: one ``InputPartition`` per row band, so a
1000-executor cluster scans bands in parallel and Spark's planner sees
the source as splittable — nothing is driver-materialized.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


class RadohydroGridDataSource(DataSource):
    """Options: n_rows, n_cols, n_ts (ints), t0 ('YYYY-MM-DD HH:MM:SS'),
    n_bands (partition count, default 4).  Doubles as a STREAMING source
    (``spark.readStream.format("radohydro_grid")``): offset = hour
    index, one micro-batch per hour — the shape of a live DWD mirror
    poll, with ``readBetweenOffsets`` giving exactly-once replay after
    failure."""

    @classmethod
    def name(cls) -> str:
        return "radohydro_grid"

    def schema(self) -> str:
        return "ts timestamp, cell_row int, cell_col int, value double"

    def reader(self, schema) -> "RadohydroGridReader":
        return RadohydroGridReader(self.options)

    def simpleStreamReader(self, schema) -> "RadohydroGridStreamReader":
        return RadohydroGridStreamReader(self.options)


class _Band(InputPartition):
    def __init__(self, row_start: int, row_end: int):
        self.row_start = row_start
        self.row_end = row_end


class RadohydroGridReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 6))
        self.n_cols = int(options.get("n_cols", 8))
        self.n_ts = int(options.get("n_ts", 24))
        self.t0 = options.get("t0", "2024-01-01 00:00:00")
        self.n_bands = max(1, int(options.get("n_bands", 4)))

    def partitions(self):
        bands = min(self.n_bands, self.n_rows)
        step = (self.n_rows + bands - 1) // bands
        return [
            _Band(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _Band):
        t0 = datetime.strptime(self.t0, "%Y-%m-%d %H:%M:%S")
        for cell_row in range(partition.row_start, partition.row_end):
            for cell_col in range(self.n_cols):
                dirty_cell = (cell_row * 13 + cell_col * 7) % 5 == 0
                for h in range(self.n_ts):
                    if dirty_cell and (h + cell_row + cell_col) % 8 == 0:
                        value = None
                    else:
                        value = float((cell_row * 31 + cell_col * 17 + h * 13) % 120)
                    yield (t0 + timedelta(hours=h), cell_row, cell_col, value)


def _hour_rows(n_rows: int, n_cols: int, t0: datetime, h: int):
    ts = t0 + timedelta(hours=h)
    for cell_row in range(n_rows):
        for cell_col in range(n_cols):
            if ((cell_row * 13 + cell_col * 7) % 5 == 0) and (
                (h + cell_row + cell_col) % 8 == 0
            ):
                value = None
            else:
                value = float((cell_row * 31 + cell_col * 17 + h * 13) % 120)
            yield (ts, cell_row, cell_col, value)


class RadohydroGridStreamReader(SimpleDataSourceStreamReader):
    """Offset-managed micro-batch reader: ``{"h": k}`` means hours
    [0, k) are committed.  ``read`` emits one hour per trigger until the
    bounded horizon (``n_ts``) is reached, then reports no progress;
    ``readBetweenOffsets`` regenerates any committed span for replay
    (the exactly-once contract after a failed batch)."""

    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 6))
        self.n_cols = int(options.get("n_cols", 8))
        self.n_ts = int(options.get("n_ts", 24))
        self.t0 = datetime.strptime(
            options.get("t0", "2024-01-01 00:00:00"), "%Y-%m-%d %H:%M:%S"
        )

    def initialOffset(self):
        return {"h": 0}

    def read(self, start):
        # LIST-backed iterators: Spark's prefetch cache copy.copy()s the
        # returned iterator, which fails on raw generators
        h = start["h"]
        if h >= self.n_ts:
            return iter([]), {"h": h}
        rows = list(_hour_rows(self.n_rows, self.n_cols, self.t0, h))
        return iter(rows), {"h": h + 1}

    def readBetweenOffsets(self, start, end):
        rows = [
            row
            for h in range(start["h"], end["h"])
            for row in _hour_rows(self.n_rows, self.n_cols, self.t0, h)
        ]
        return iter(rows)


class ShardStoreDataSource(DataSource):
    """Custom WRITE path (DataSourceWriter): ``df.write.format(
    "radohydro_shards").option("path", ...)`` stores each partition as a
    content-addressed JSONL shard (file name = md5 of the shard bytes)
    and the driver-side ``commit`` publishes a ``_MANIFEST.json`` naming
    every committed shard — the two-phase commit protocol of a real
    lakehouse sink, in its minimal honest form.  Content addressing
    makes speculative/retried task attempts idempotent: identical input
    produces the identical file name and bytes.
    """

    @classmethod
    def name(cls) -> str:
        return "radohydro_shards"

    def writer(self, schema, overwrite: bool):
        return ShardStoreWriter(self.options, [f.name for f in schema.fields])


class _ShardCommit(WriterCommitMessage):
    """Picklable commit message: (file name, row count)."""

    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class ShardStoreWriter(DataSourceWriter):
    def __init__(self, options: dict, columns: list[str]):
        self.path = options["path"]
        self.columns = columns

    def write(self, iterator):
        import hashlib
        import json
        import os

        lines = []
        for row in iterator:
            rec = {c: row[i] for i, c in enumerate(self.columns)}
            lines.append(json.dumps(rec, sort_keys=True, default=str))
        payload = ("\n".join(lines) + "\n").encode() if lines else b""
        if not payload:
            return _ShardCommit("", 0)
        digest = hashlib.md5(payload).hexdigest()
        fname = f"shard-{digest}.jsonl"
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, fname), "wb") as f:
            f.write(payload)
        return _ShardCommit(fname, len(lines))

    def commit(self, messages):
        import json
        import os

        shards = sorted(
            (
                {"file": m.filename, "rows": m.n_rows}
                for m in messages
                if m is not None and m.n_rows
            ),
            key=lambda s: s["file"],
        )
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump({"shards": shards, "n_rows": sum(s["rows"] for s in shards)}, f)

    def abort(self, messages):
        import os

        for m in messages or []:
            if m is not None and m.n_rows:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass
