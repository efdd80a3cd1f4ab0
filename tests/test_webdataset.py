"""WebDataset TAR shard I/O (extensions/webdataset.py, r7).

Oracle strategy: tar framing is lossless, so write->read roundtrips
assert exact byte equality per member; the stdlib ``tarfile`` module
doubles as the independent WRITER whose archives our reader must
group identically; grouping semantics (first-dot key split,
out-of-order tolerance, multi-extension members) are pinned
explicitly.
"""

from __future__ import annotations

import io
import os
import tarfile

import numpy as np
import pytest

from goodtables_pandas_py_spark.extensions.webdataset import (
    _split_key,
    iter_tar_samples,
    read_webdataset,
    write_webdataset,
)


def test_key_split_first_dot():
    assert _split_key("000123.jpg") == ("000123", "jpg")
    assert _split_key("000123.seg.json") == ("000123", "seg.json")
    assert _split_key("a/b/x.txt") == ("a/b/x", "txt")
    assert _split_key("noext") == ("noext", "")


def _stdlib_tar(samples, compress=False):
    """Independent writer: stdlib tarfile, consecutive members."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz" if compress else "w") as tf:
        for key, files in samples:
            for ext, data in files.items():
                info = tarfile.TarInfo(
                    name=f"{key}.{ext}" if ext else key
                )
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def test_iter_tar_samples_groups_and_preserves_bytes():
    samples = [
        ("000000", {"txt": b"hello", "json": b"{}"}),
        ("000001", {"txt": b"world", "jpg": b"\xff\xd8fake"}),
        ("000002", {"seg.json": b"[1,2]"}),
    ]
    for compress in (False, True):
        got = list(iter_tar_samples(_stdlib_tar(samples, compress)))
        assert [(k, f) for k, f in got] == samples


def test_iter_tar_samples_tolerates_out_of_order_members():
    """A non-conforming tool interleaving keys must not split
    samples."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in [
            ("a.txt", b"1"), ("b.txt", b"2"), ("a.json", b"3"),
            ("b.json", b"4"),
        ]:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    got = dict(iter_tar_samples(buf.getvalue()))
    assert got == {
        "a": {"txt": b"1", "json": b"3"},
        "b": {"txt": b"2", "json": b"4"},
    }


def test_spark_roundtrip_exact(spark, tmp_path):
    """write_webdataset -> read_webdataset: every member byte-exact,
    sample count preserved, shard splitting at samples_per_shard."""
    rows = [
        (
            f"{i:06d}",
            {
                "txt": f"document {i}".encode(),
                "bin": bytes([i % 256] * (i % 7 + 1)),
            },
        )
        for i in range(23)
    ]
    df = spark.createDataFrame(
        rows, "key string, files map<string, binary>"
    ).repartition(2)
    out = str(tmp_path / "shards")
    manifest = write_webdataset(
        df, out, samples_per_shard=5
    ).collect()
    assert sum(r["n_samples"] for r in manifest) == 23
    # 2 partitions x ceil splits of 5 -> every shard <= 5 samples
    assert all(1 <= r["n_samples"] <= 5 for r in manifest)
    assert all(os.path.exists(r["shard"]) for r in manifest)
    assert not any(p.endswith(".tmp") for p in os.listdir(out))

    back = read_webdataset(spark, out + "/*.tar").collect()
    got = {r["key"]: dict(r["files"]) for r in back}
    want = {k: f for k, f in rows}
    assert {k: {e: bytes(v) for e, v in f.items()} for k, f in got.items()} \
        == want


def test_spark_read_keep_exts_prunes(spark, tmp_path):
    rows = [("k1", {"txt": b"t", "jpg": b"J" * 100})]
    df = spark.createDataFrame(
        rows, "key string, files map<string, binary>"
    )
    out = str(tmp_path / "s2")
    write_webdataset(df, out).collect()
    back = read_webdataset(
        spark, out + "/*.tar", keep_exts=["txt"]
    ).first()
    assert dict(back["files"]) == {"txt": b"t"}


def test_spark_roundtrip_gz(spark, tmp_path):
    rows = [(f"k{i}", {"txt": str(i).encode()}) for i in range(4)]
    df = spark.createDataFrame(
        rows, "key string, files map<string, binary>"
    )
    out = str(tmp_path / "gz")
    manifest = write_webdataset(df, out, compress=True).collect()
    assert all(r["shard"].endswith(".tar.gz") for r in manifest)
    back = read_webdataset(spark, out + "/*.tar.gz").collect()
    assert {r["key"]: bytes(r["files"]["txt"]) for r in back} == {
        f"k{i}": str(i).encode() for i in range(4)
    }


def test_real_media_members_roundtrip(spark, tmp_path):
    """A realistic multimodal sample: PNG image + caption + JSON —
    the image decodes from the roundtripped bytes."""
    from goodtables_pandas_py_spark.extensions.imagecodec import (
        DecodedImage,
        decode_image_bytes,
        encode_png,
    )

    rng = np.random.default_rng(0)
    img = DecodedImage(
        8, 6, 3, rng.integers(0, 256, 144, dtype=np.uint8).tobytes()
    )
    rows = [("sample0", {
        "png": encode_png(img),
        "txt": b"a caption",
        "json": b'{"src": "test"}',
    })]
    df = spark.createDataFrame(
        rows, "key string, files map<string, binary>"
    )
    out = str(tmp_path / "media")
    write_webdataset(df, out).collect()
    back = read_webdataset(spark, out + "/*.tar").first()
    files = {e: bytes(v) for e, v in back["files"].items()}
    assert decode_image_bytes(files["png"]) == img
    assert files["txt"] == b"a caption"


def test_member_arriving_many_keys_late_never_splits_sample():
    """r7 review fix: a member landing >= 2 keys after its siblings
    must still join its sample (whole-archive grouping — the old
    look-behind-2 flush emitted 'a' twice with partial files)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in [
            ("a.txt", b"1"), ("b.txt", b"2"), ("c.txt", b"3"),
            ("d.txt", b"4"), ("a.json", b"5"),
        ]:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    got = list(iter_tar_samples(buf.getvalue()))
    keys = [k for k, _ in got]
    assert keys == ["a", "b", "c", "d"]  # no duplicate 'a'
    assert dict(got)["a"] == {"txt": b"1", "json": b"5"}


def test_keep_exts_skips_payload_read(monkeypatch):
    """r7 review fix: excluded members' payloads are never read
    (extractfile is not even called for them)."""
    import tarfile as tfmod

    samples = [("k", {"txt": b"keep", "jpg": b"J" * 1000})]
    blob = _stdlib_tar(samples)
    reads = []
    orig = tfmod.TarFile.extractfile

    def spy(self, member):
        reads.append(member.name)
        return orig(self, member)

    monkeypatch.setattr(tfmod.TarFile, "extractfile", spy)
    got = dict(iter_tar_samples(blob, keep_exts={"txt"}))
    assert got == {"k": {"txt": b"keep"}}
    assert reads == ["k.txt"]  # the jpg payload was never touched


def test_streaming_shard_ingest(spark, tmp_path):
    """Shards as a STREAMING source: readStream(binaryFile) feeds the
    same Arrow tar-walk kernel (mapInPandas works unchanged on a
    streaming frame) — the arriving-shards ingest shape."""
    rows = [(f"{i:04d}", {"txt": str(i).encode()}) for i in range(12)]
    df = spark.createDataFrame(
        rows, "key string, files map<string, binary>"
    ).repartition(3)
    shard_dir = str(tmp_path / "stream_shards")
    write_webdataset(df, shard_dir, samples_per_shard=3).collect()

    from goodtables_pandas_py_spark.extensions.webdataset import (
        SAMPLE_SCHEMA,
        iter_tar_samples,
    )
    import pandas as pd

    stream = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp,"
            " length long, content binary"
        )
        .load(shard_dir + "/*.tar")
    )

    def batches(it):
        for pdf in it:
            out = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                for key, files in iter_tar_samples(blob, p):
                    out.append((p, key, files))
            yield pd.DataFrame(out, columns=["shard", "key", "files"])

    samples = stream.select("path", "content").mapInPandas(
        batches, SAMPLE_SCHEMA
    )
    sink = str(tmp_path / "sink")
    q = (
        samples.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = spark.read.parquet(sink)
    assert back.count() == 12
    got = {r["key"]: bytes(r["files"]["txt"]) for r in back.collect()}
    assert got == {f"{i:04d}": str(i).encode() for i in range(12)}


def test_keep_exts_drops_memberless_samples():
    """r11 review: a sample NONE of whose members survive keep_exts
    must not yield a phantom empty-files row."""
    samples = [
        ("a", {"txt": b"keep", "jpg": b"J"}),
        ("imgonly", {"jpg": b"J", "png": b"P"}),
        ("b", {"txt": b"also"}),
    ]
    blob = _stdlib_tar(samples)
    got = dict(iter_tar_samples(blob, keep_exts={"txt"}))
    assert got == {"a": {"txt": b"keep"}, "b": {"txt": b"also"}}


def test_write_tmp_names_are_attempt_unique(spark, tmp_path):
    """r11 review: the shard tmp path embeds the task ATTEMPT id, so
    a speculative/zombie second attempt of the same partition can
    never interleave into the first attempt's .tmp and rename a torn
    tar into place. (Attempt concurrency itself can't be forced in
    local mode — pin the naming contract instead.)"""
    import glob

    from goodtables_pandas_py_spark.extensions.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    df = spark.createDataFrame(
        [(f"k{i}", {"txt": bytearray(b"x")}) for i in range(4)],
        "key string, files map<string, binary>",
    ).coalesce(1)
    out = str(tmp_path / "wds")
    manifest = write_webdataset(df, out, samples_per_shard=2).collect()
    assert len(manifest) == 2
    # finals renamed into place, no tmp left behind
    assert glob.glob(out + "/*.tmp") == []
    finals = sorted(glob.glob(out + "/part-*.tar"))
    assert len(finals) == 2
    assert read_webdataset(spark, out + "/*.tar").count() == 4
