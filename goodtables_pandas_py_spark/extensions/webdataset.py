"""WebDataset-style TAR shard I/O (r7 — a first-class training-data
container: large multimodal corpora ship as numbered ``.tar`` shards
whose members group into samples by key — ``000123.jpg`` +
``000123.txt`` + ``000123.json`` is ONE sample; see the public
webdataset convention).

Spark-first shape:

- **Read**: ``spark.read.format("binaryFile")`` lists the shards and
  hands each task a whole shard blob — the shard IS the
  100 TB-friendly unit of parallelism (a corpus is thousands of
  ~100 MB-1 GB shards; `spark.sql.files.maxPartitionBytes` has no
  effect on binaryFile, it's one row per file, one task per row at
  default partitioning). An Arrow-batched ``mapInPandas`` then walks
  each tar IN MEMORY with stdlib ``tarfile`` and regroups members
  into samples — map-only, no shuffle, schema fixed:
  ``(shard, key, files MAP<STRING, BINARY>)``.
- **Write**: one (or more) shards PER PARTITION, written inside the
  same map-only pass (``foreachPartition`` semantics with a manifest
  row yielded per shard) — repartition upstream to choose the shard
  count. Atomicity: each shard writes to ``<name>.<attempt>.tmp``
  (attempt-unique, so speculative/zombie attempts never interleave
  into one file) and renames
  into place, so readers never see a torn tar; pair with
  :func:`.pipeline.write_release_version` for whole-release atomic
  publish.

Compression: ``.tar`` plain; ``.tar.gz`` transparently on read
(stdlib) and by flag on write. Sorting: members are grouped by the
webdataset contract (consecutive members share a key; the reader
ALSO tolerates out-of-order members by buffering per key — the
strict-consecutive variant would silently split samples written by
non-conforming tools).
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField(
            "files", T.MapType(T.StringType(), T.BinaryType())
        ),
    ]
)

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _split_key(name: str) -> tuple[str, str]:
    """webdataset key split: basename up to the FIRST dot is the
    sample key, the rest is the extension ('a/b/000123.seg.json' ->
    ('a/b/000123', 'seg.json'))."""
    dirname, base = os.path.split(name)
    if "." in base:
        stem, ext = base.split(".", 1)
    else:
        stem, ext = base, ""
    return (os.path.join(dirname, stem) if dirname else stem, ext)


def iter_tar_samples(
    blob: bytes, shard: str = "", keep_exts: set[str] | None = None
):
    """Yield (key, {ext: bytes}) samples from one tar blob (gz
    transparently), in first-seen key order. Members may arrive in
    ANY order — samples are grouped over the whole archive, never
    split (the blob is already fully in memory as one binaryFile
    row, so whole-archive buffering adds at most a second copy of
    the kept payloads — early flushing that guessed at member
    adjacency could silently split a sample written by a
    non-conforming tool, r7 review fix). ``keep_exts`` skips
    excluded members BEFORE their payload is read — tarfile reads
    lazily, so an image-heavy shard costs nothing on a text-only
    pass."""
    buf: dict[str, dict[str, bytes]] = {}
    order: list[str] = []
    with tarfile.open(fileobj=io.BytesIO(bytes(blob)), mode="r:*") as tf:
        for member in tf:
            if not member.isfile():
                continue
            key, ext = _split_key(member.name)
            if keep_exts is not None and ext not in keep_exts:
                continue  # payload never read; key NOT registered —
                # a sample none of whose members survive the filter
                # must not yield a phantom empty-files row (r11 review)
            if key not in buf:
                buf[key] = {}
                order.append(key)
            fh = tf.extractfile(member)
            buf[key][ext] = fh.read() if fh is not None else b""
    for k in order:
        yield k, buf.pop(k)


def read_webdataset(
    spark: SparkSession,
    path: str,
    keep_exts: list[str] | None = None,
) -> DataFrame:
    """Shards matching ``path`` (glob ok) -> one row per SAMPLE:
    ``(shard, key, files MAP<ext, bytes>)``. ``keep_exts`` prunes the
    map early (e.g. ``["txt", "json"]`` skips image payloads before
    they ever cross the Arrow boundary — the binary column pruning a
    100 TB text-only pass needs)."""
    shards = spark.read.format("binaryFile").load(path)
    keep = set(keep_exts) if keep_exts is not None else None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for shard_path, blob in zip(pdf["path"], pdf["content"]):
                for key, files in iter_tar_samples(
                    blob, shard_path, keep_exts=keep
                ):
                    rows.append((shard_path, key, files))
            yield pd.DataFrame(rows, columns=["shard", "key", "files"])

    return shards.select("path", "content").mapInPandas(
        batches, SAMPLE_SCHEMA
    )


def write_webdataset(
    df: DataFrame,
    out_dir: str,
    samples_per_shard: int = 10_000,
    compress: bool = False,
    key_col: str = "key",
    files_col: str = "files",
) -> DataFrame:
    """(key, files map) rows -> numbered tar shards under ``out_dir``
    (``part-<partition>-<seq>.tar[.gz]``), one writer per partition
    (repartition upstream to pick shard parallelism). Members are
    written consecutively per sample in key order within the shard,
    the conforming webdataset layout. Each shard lands via
    write-to-tmp + atomic rename. Returns the MANIFEST DataFrame
    (shard, n_samples, n_bytes) — an action on it drives the write.

    ``out_dir`` must be a filesystem path every executor can reach
    (local/NFS here; on object storage, front with the store's
    fuse/committer or write shards locally and upload — the tar
    layout itself is storage-agnostic)."""
    os.makedirs(out_dir, exist_ok=True)
    suffix = ".tar.gz" if compress else ".tar"
    mode = "w:gz" if compress else "w"

    def write_partition(
        it: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        # the tmp name must be unique PER ATTEMPT, not per partition:
        # with speculation (or a zombie original overlapping a retry)
        # two attempts of the same partition would interleave into one
        # .tmp and os.replace a torn tar into place (r11 review)
        attempt = ctx.taskAttemptId() if ctx else 0
        seq = 0
        out_rows = []
        tf = None
        tmp_path = final_path = None
        n_in_shard = 0

        def open_shard():
            nonlocal tf, tmp_path, final_path, n_in_shard
            final_path = os.path.join(
                out_dir, f"part-{pid:05d}-{seq:04d}{suffix}"
            )
            tmp_path = f"{final_path}.{attempt}.tmp"
            tf = tarfile.open(tmp_path, mode)
            n_in_shard = 0

        def close_shard():
            nonlocal tf, seq
            if tf is None:
                return
            tf.close()
            os.replace(tmp_path, final_path)
            out_rows.append(
                (final_path, n_in_shard, os.path.getsize(final_path))
            )
            tf = None
            seq += 1

        for pdf in it:
            for key, files in zip(pdf[key_col], pdf[files_col]):
                if tf is None:
                    open_shard()
                for ext in sorted(files):
                    data = bytes(files[ext])
                    name = f"{key}.{ext}" if ext else str(key)
                    info = tarfile.TarInfo(name=name)
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
                n_in_shard += 1
                if n_in_shard >= samples_per_shard:
                    close_shard()
        close_shard()
        yield pd.DataFrame(
            out_rows, columns=["shard", "n_samples", "n_bytes"]
        )

    return df.select(
        F.col(key_col).alias(key_col), F.col(files_col).alias(files_col)
    ).mapInPandas(write_partition, MANIFEST_SCHEMA)


__all__ = [
    "MANIFEST_SCHEMA",
    "SAMPLE_SCHEMA",
    "iter_tar_samples",
    "read_webdataset",
    "write_webdataset",
]
