"""Pluggable artifact writers (reference ops S4–S9, S7/S8 sinks).

The reference materializes many small artifacts (one CSV per region, one
protobuf per tile) to S3/Minio or local disk from inside worker-side
``groupby().apply`` lambdas. The Spark-native equivalent: executors write
inside ``applyInPandas`` / ``foreachPartition`` after a repartition on the
grouping keys, through a destination object small enough to pickle.

Writers:
    FileWriter  — local filesystem (dirs auto-created)
    S3Writer    — any S3-compatible store via boto3 (import-gated; one
                  client per executor process, lazily created)
    NullWriter  — no-op, for profiling compute without the sink

Path conventions follow the reference's `{data_id}/{run_id}/...` layout
(/root/reference/doc/minio-folder-structure.md).
"""

from __future__ import annotations

import json
import os
from typing import Iterable


class FileWriter:
    """S5: write bytes/str to a local path, creating directories."""

    def __init__(self, root: str):
        self.root = root

    def write(self, body: bytes | str, rel_path: str) -> None:
        path = os.path.join(self.root, rel_path)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        mode = "wb" if isinstance(body, (bytes, bytearray)) else "w"
        with open(path, mode) as f:
            f.write(body)


class NullWriter:
    """S6: swallow everything (profiling sink)."""

    def __init__(self, *_args, **_kwargs):
        pass

    def write(self, body: bytes | str, rel_path: str) -> None:
        pass


class S3Writer:
    """S4: put_object to an S3-compatible store.

    The boto3 client is created lazily per process (executors each build
    their own after unpickling) and cached — the reference does the same
    per Dask worker.  ``client_kwargs`` pass through to
    ``boto3.client('s3', ...)`` (credentials, region) so executors need
    no ambient AWS config — the whole writer state must survive pickling
    into Python workers.
    """

    def __init__(
        self,
        bucket: str,
        endpoint_url: str | None = None,
        client_kwargs: dict | None = None,
    ):
        self.bucket = bucket
        self.endpoint_url = endpoint_url
        self.client_kwargs = client_kwargs or {}
        self._client = None

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_client"] = None
        return state

    @property
    def client(self):
        if self._client is None:
            import boto3  # optional dependency, only needed for S3 runs

            self._client = boto3.client(
                "s3", endpoint_url=self.endpoint_url, **self.client_kwargs
            )
        return self._client

    def write(self, body: bytes | str, rel_path: str) -> None:
        if isinstance(body, str):
            body = body.encode()
        self.client.put_object(Bucket=self.bucket, Key=rel_path, Body=body)


WRITE_TYPES = {"file": FileWriter, "s3": S3Writer, "null": NullWriter}


# ---------------------------------------------------------------------------
# Grouped sinks
# ---------------------------------------------------------------------------


def _escape_dotted(df, *col_lists):
    """Shim for PySpark's plain-string column resolution: ``groupBy`` /
    ``applyInPandas`` resolve names like ``"1.0"`` (a pivoted qualifier
    value — the reference's pandas pipeline produces such headers freely)
    as the multi-part path ```1`.`0``` and fail. Rename offending columns
    to positional placeholders for the Spark-side shuffle and hand back a
    restore map so the pandas side (and the written artifact headers)
    keeps the original names. Returns (df, restore_map, mapped_col_lists).
    """
    safe = {
        c: f"__dotted_{i}"
        for i, c in enumerate(df.columns)
        if "." in c or "`" in c
    }
    if safe:
        df = df.toDF(*[safe.get(c, c) for c in df.columns])
    mapped = [[safe.get(c, c) for c in cols] for cols in col_lists]
    return df, {v: k for k, v in safe.items()}, mapped


def write_grouped_csv(
    df,
    group_cols: list[str],
    path_fn,
    writer,
    drop_group_cols: bool = True,
    sort_cols: list[str] | None = None,
) -> int:
    """S7-style sink: one CSV artifact per distinct group.

    ``path_fn(group_key_dict) -> rel_path``. Executes as ``applyInPandas``
    over a hash-repartition on the group columns, so each group is
    serialized exactly once, executor-side. Returns number of files.
    ``sort_cols`` orders rows inside each artifact (group row order
    otherwise follows shuffle partitioning, which varies with cluster
    layout — sorted artifacts are byte-stable across runs).
    """
    import pandas as pd

    value_cols = [c for c in df.columns if c not in group_cols]
    df, restore, (g_cols,) = _escape_dotted(df, group_cols)

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        if restore:
            pdf = pdf.rename(columns=restore)
        key = {c: pdf.iloc[0][c] for c in group_cols}
        if sort_cols:
            pdf = pdf.sort_values(sort_cols, kind="mergesort")
        body = pdf[value_cols].to_csv(index=False) if drop_group_cols else pdf.to_csv(index=False)
        writer.write(body, path_fn(key))
        return pd.DataFrame({"n": [len(pdf)]})

    out = df.groupBy(*g_cols).applyInPandas(emit, schema="n long")
    return out.count()


def write_grouped_csv_bundles(
    df,
    group_cols: list[str],
    key_fn,
    bundle_path_fn,
    writer,
    sort_cols: list[str] | None = None,
) -> int:
    """Scale-path grouped-CSV sink: pack each partition's groups into ONE
    bundle object plus a JSON index instead of one object per group.

    The per-group CSV layout (the reference's many-small-files problem —
    tens of thousands of regional-timeseries CSVs) becomes O(partitions)
    store objects; a serving layer reads ``<bundle>.idx.json``
    ({key: [offset, len]}) and range-reads the bundle.  ``key_fn(group
    key dict) -> index key``; ``bundle_path_fn(partition_id) -> path``.
    A repartition on the group columns guarantees each group lands whole
    in exactly one partition; rows are buffered per partition (size that
    with AQE/shuffle-partition settings).  Returns number of groups.
    """
    import json as _json

    import pandas as pd
    from pyspark.sql import functions as F

    value_cols = [c for c in df.columns if c not in group_cols]
    df, restore, (g_cols,) = _escape_dotted(df, group_cols)

    def emit(batches):
        frames: list[pd.DataFrame] = []
        pid = None
        for pdf in batches:
            if restore:
                pdf = pdf.rename(columns=restore)
            if len(pdf) and pid is None:
                pid = int(pdf["_pid"].iloc[0])
            frames.append(pdf)
        if not frames or pid is None:
            yield pd.DataFrame({"n": [0]})
            return
        whole = pd.concat(frames, ignore_index=True)
        chunks: list[bytes] = []
        index: dict[str, list[int]] = {}
        offset = 0
        for key_vals, g in whole.groupby(group_cols, sort=True, dropna=False):
            if not isinstance(key_vals, tuple):
                key_vals = (key_vals,)
            key = key_fn(dict(zip(group_cols, key_vals)))
            if sort_cols:
                g = g.sort_values(sort_cols, kind="mergesort")
            body = g[value_cols].to_csv(index=False).encode()
            index[key] = [offset, len(body)]
            chunks.append(body)
            offset += len(body)
        base = bundle_path_fn(pid)
        writer.write(b"".join(chunks), base + ".bundle")
        writer.write(_json.dumps(index), base + ".idx.json")
        yield pd.DataFrame({"n": [len(index)]})

    out = (
        df.repartition(*[F.col(c) for c in g_cols])
        .withColumn("_pid", F.spark_partition_id())
        .mapInPandas(emit, schema="n long")
    )
    return out.agg(F.sum("n")).first()[0] or 0


def write_json(obj, rel_path: str, writer) -> None:
    """S9: driver-side JSON artifact (small data: run metadata, lists)."""
    writer.write(json.dumps(obj, default=str), rel_path)


def write_grouped_json(df, group_cols: list[str], path_fn, writer,
                       payload_fn) -> int:
    """Executor-side JSON artifacts, one per distinct group.

    The streaming analogue of ``write_json`` for payloads that scale with
    the data (per-feature region inventories, qualifier value lists): the
    group's rows arrive as one pandas frame inside ``applyInPandas``,
    ``payload_fn(pdf) -> obj`` shapes the JSON body, and the write happens
    on the executor — group contents never transit the driver, so driver
    memory stays flat no matter how many distinct values a feature has.
    Returns the number of artifacts written.
    """
    import pandas as pd

    df, restore, (g_cols,) = _escape_dotted(df, group_cols)

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        if restore:
            pdf = pdf.rename(columns=restore)
        key = {c: pdf.iloc[0][c] for c in group_cols}
        writer.write(json.dumps(payload_fn(pdf), default=str), path_fn(key))
        return pd.DataFrame({"n": [1]})

    return df.groupBy(*g_cols).applyInPandas(emit, schema="n long").count()


def write_tile_bundles(
    tiles_df,
    bundle_path_fn,
    writer,
    tiles_per_partition_hint: int = 4096,
) -> int:
    """Scale-path tile sink: pack each partition's tiles into ONE bundle
    object plus a JSON index, instead of one object per tile.

    The reference's per-tile layout was upload-bound at high precision
    (~400k objects); bundling turns that into O(partitions) objects. A
    serving layer reads `<bundle>.idx.json` ({tile_key: [offset, len]})
    and range-reads the bundle. ``bundle_path_fn(partition_id) -> path``.
    Repartition upstream to hit ``tiles_per_partition_hint``.
    """
    import json as _json

    import pandas as pd
    from pyspark.sql import functions as F

    from slow_tortoise_spark.sinks.tile_proto import encode_tile

    # Arrow-batched executor-side sink: structs arrive as plain dicts, no
    # JVM→Python Row deserialization; the partition id rides along as a
    # column because mapInPandas doesn't expose one.
    def emit(batches):
        chunks: list[bytes] = []
        index: dict[str, list[int]] = {}
        offset = 0
        pid = None
        for pdf in batches:
            if len(pdf) and pid is None:
                pid = int(pdf["_pid"].iloc[0])
            for row in pdf.itertuples(index=False):
                bins = {
                    b["bin"]: (
                        b["s_sum_t_sum"], b["s_sum_t_mean"], float(b["weight"])
                    )
                    for b in row.bins
                }
                tile = row.tile
                buf = encode_tile(tile["z"], tile["x"], tile["y"],
                                  row.total_bins, bins)
                key = (f"{row.feature}/{row.timestamp}-{tile['z']}-"
                       f"{tile['x']}-{tile['y']}")
                index[key] = [offset, len(buf)]
                chunks.append(buf)
                offset += len(buf)
        if chunks:
            base = bundle_path_fn(pid)
            writer.write(b"".join(chunks), base + ".bundle")
            writer.write(_json.dumps(index), base + ".idx.json")
        yield pd.DataFrame({"n": [len(chunks)]})

    out = tiles_df.withColumn("_pid", F.spark_partition_id()).mapInPandas(
        emit, schema="n long"
    )
    return out.agg(F.sum("n")).first()[0] or 0


def write_tiles(tiles_df, path_fn, writer, debug: bool = False) -> int:
    """S8: serialize + write one protobuf per tile row, executor-side.

    ``tiles_df`` is the output of operators.tiles.tiles_for_level /
    tiles_all_levels; ``path_fn(row_dict) -> rel_path``.  ``debug=True``
    writes the human-readable dict repr instead of protobuf bytes (the
    reference's ``save_tile(debug=True)`` ``.txt`` variant,
    /root/reference/flows/common.py:291-309) — pair it with a ``.txt``
    path convention in ``path_fn``.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    from slow_tortoise_spark.sinks.tile_proto import encode_tile

    cols = tiles_df.columns

    # Arrow-batched, executor-side; the only job output is one count per
    # batch, aggregated below — tile bytes never reach the driver.
    def emit(batches) -> Iterable:
        for pdf in batches:
            for i in range(len(pdf)):
                row = {c: pdf[c].iloc[i] for c in cols}
                bins = {
                    b["bin"]: (
                        b["s_sum_t_sum"], b["s_sum_t_mean"], float(b["weight"])
                    )
                    for b in row["bins"]
                }
                tile = row["tile"]
                if debug:
                    body = str({
                        "coord": {"z": tile["z"], "x": tile["x"], "y": tile["y"]},
                        "total_bins": row["total_bins"],
                        "bins": bins,
                    })
                else:
                    body = encode_tile(tile["z"], tile["x"], tile["y"],
                                       row["total_bins"], bins)
                writer.write(body, path_fn(row))
            yield pd.DataFrame({"n": [len(pdf)]})

    out = tiles_df.mapInPandas(emit, schema="n long")
    return out.agg(F.sum("n")).first()[0] or 0


def write_webdataset_shards(
    df,
    path_fn,
    writer,
    key_col: str = "doc_id",
    text_col: str = "text",
    meta_cols: list[str] | None = None,
    shard_size: int = 1000,
) -> int:
    """Training-loader sink: pack documents into WebDataset-style tar
    shards (the public webdataset convention — each sample is a run of
    files sharing a basename: ``{key}.txt`` payload + ``{key}.json``
    metadata; loaders stream shards sequentially, so one tar per ~1k
    samples beats a million tiny objects for exactly the reason the
    tile/CSV bundle sinks exist).

    Shard membership is ``key // shard_size`` — a pure projection, so
    the same corpus always packs into the same shards regardless of
    cluster layout (sparse keys make small shards; deterministic beats
    dense here).  One shuffle groups each shard's rows; each tar is
    built in memory (samples sorted by key, zeroed mtimes) making shard
    bytes reproducible run-to-run.  ``path_fn(shard_id) -> rel path``.
    Returns the number of samples written; a ``manifest.json``
    ({shard path: sample count}) is written beside the shards.
    """
    import io
    import json as _json
    import tarfile

    import pandas as pd
    from pyspark.sql import functions as F

    meta_cols = list(meta_cols or [])

    def emit(key, pdf):
        shard_id = int(key[0])
        pdf = pdf.sort_values(key_col, kind="mergesort")
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for _, row in pdf.iterrows():
                base = str(row[key_col])
                body = str(row[text_col]).encode()
                meta = _json.dumps(
                    {c: row[c] for c in meta_cols}, default=str
                ).encode()
                for suffix, payload in ((".txt", body), (".json", meta)):
                    info = tarfile.TarInfo(base + suffix)
                    info.size = len(payload)
                    info.mtime = 0
                    tar.addfile(info, io.BytesIO(payload))
        rel = path_fn(shard_id)
        writer.write(buf.getvalue(), rel)
        return pd.DataFrame({"shard": [rel], "n": [len(pdf)]})

    shards = (
        # integer DIV, not float division: double arithmetic silently
        # mis-shards keys past 2^53
        df.withColumn(
            "_shard", F.expr(f"`{key_col}` DIV {int(shard_size)}")
        )
        .groupBy("_shard")
        .applyInPandas(emit, schema="shard string, n long")
        .collect()
    )
    manifest = {r["shard"]: r["n"] for r in shards}
    # manifest lands beside the shards (path_fn's directory), so two
    # shard sets written through one writer root (train/ and val/, say)
    # keep separate inventories instead of clobbering a fixed key
    manifest_rel = os.path.join(
        os.path.dirname(path_fn(0)), "manifest.json"
    )
    write_json(manifest, manifest_rel, writer)
    return sum(manifest.values())
