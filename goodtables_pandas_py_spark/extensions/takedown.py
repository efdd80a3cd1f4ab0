"""End-to-end document takedown across a versioned release AND its
ANN index (r11).

The two halves exist separately — :func:`pipeline.write_release_merge`
deletes keys from a release, :func:`vecindex.delete_from_ivf_index_version`
purges postings from an index — but a compliance takedown needs BOTH,
and sequencing them by hand invites the gap this module closes: a
crash between the halves leaves documents served by one surface and
gone from the other, with no single audit record tying the operation
together.

Crash-safety is BY REPLAY, not by a cross-root transaction (there is
deliberately no 2-phase commit across two independent version roots —
each root keeps its own single-writer claim + atomic pointer swap):
both halves are idempotent no-ops when their ids are already gone, so
re-running the same call after any partial failure completes exactly
the missing half and publishes nothing twice. The composite is
therefore at-least-once-safe end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["ingest_documents", "takedown_documents"]


def takedown_documents(
    spark: SparkSession,
    release_root: str,
    ids,
    index_root: str | None = None,
    id_col: str = "doc_id",
    split_col: str = "split",
    keep_versions: int | None = None,
    broadcast_cap: int = 5_000_000,
    verify: bool = False,
) -> dict:
    """Remove ``ids`` from the CURRENT release under ``release_root``
    and (when given) from the CURRENT index version under
    ``index_root``, in one audited call.

    Order is release first, then index: the release is the content
    surface a takedown legally targets; a crash after the release
    publish leaves only stale index POSTINGS (ids pointing at content
    no longer served), which the replay purges. The reverse order
    could leave the content itself live.

    Cost ∝ touched data on both sides, never the corpus:

    - release: the requested ids are resolved to (id, split) pairs by
      ONE column-pruned scan of the current version semi-joined
      against the (broadcast, capped) id set; the merge then rewrites
      only the partitions those splits name and hardlinks the rest
      forward (see ``write_release_merge``).
    - index: ``delete_from_ivf_index_version`` rewrites only the
      lists containing the ids; untouched lists carry forward
      file-identical.

    Replay semantics: ids absent from the release produce an empty
    delete set → the merge returns the current manifest without
    publishing; the index path has the same no-op guard. Replaying a
    completed takedown therefore publishes NOTHING on either root
    (``noop_replay`` true in both audits).

    ``verify=True`` re-reads the TOUCHED partitions/lists of the new
    versions and asserts the ids are gone — cost ∝ touched data, same
    class as the deletes themselves (off by default; the publishes'
    own fingerprint machinery already audits content).

    Returns an audit dict::

        {"requested": N,
         "release": {"version", "n_deleted", "touched_splits",
                     "noop_replay", "manifest"},
         "index":   {... delete audit from the index manifest ...}
                    | None}
    """
    from .pipeline import read_release, write_release_merge
    from .vecindex import _normalize_delete_ids, delete_from_ivf_index_version

    from pyspark.sql.types import StructType

    if not split_col:
        # don't accommodate a path the callee refuses: the release
        # half is a key-delete MERGE, and write_release_merge requires
        # a split-partitioned release — say so here, with the remedy,
        # instead of raising its misleading error only when ids match
        raise ValueError(
            "takedown_documents: split_col must name the release's "
            "partition column (write_release_merge needs a "
            "partitioned release); index-only takedowns go through "
            "delete_from_ivf_index_version directly"
        )
    current, manifest = read_release(spark, release_root)
    if id_col not in current.columns:
        raise ValueError(
            f"takedown_documents: release under {release_root} has no "
            f"id column {id_col!r} (columns: {current.columns})"
        )
    # normalize via the index-side helper (it only reads the stand-in
    # frame's SCHEMA): same loud refusals for lossy casts — a takedown
    # id that silently vanished or truncated onto the wrong document
    # is exactly the failure this op exists to prevent
    del_ids = _normalize_delete_ids(
        spark, current.select(F.col(id_col).alias("id")), ids
    ).persist()
    pairs = None
    try:
        n_requested = del_ids.count()
        hint = (
            F.broadcast(del_ids) if n_requested <= broadcast_cap else del_ids
        )
        # ONE column-pruned scan resolves which (id, split) pairs the
        # release actually holds — merge needs the split to prune its
        # partition rewrites
        pairs = (
            current.select(F.col(id_col), F.col(split_col))
            .join(hint.withColumnRenamed("id", id_col), id_col, "left_semi")
            .distinct()
            .persist()
        )
        n_matched = pairs.count()

        release_audit: dict = {"noop_replay": n_matched == 0}
        if n_matched == 0:
            new_manifest = manifest
        else:
            empty_updates = spark.createDataFrame(
                [], StructType.fromJson(manifest["schema"])
            )
            new_manifest = write_release_merge(
                empty_updates,
                release_root,
                id_col=id_col,
                split_col=split_col,
                deletes=pairs,
                keep_versions=keep_versions,
                spark_for_fs=spark,
            )
        touched = sorted(
            new_manifest.get("incremental", {}).get("rewritten", [])
            + new_manifest.get("incremental", {}).get("removed", [])
        ) if n_matched else []
        release_audit.update(
            version=new_manifest.get("version"),
            n_deleted=int(n_matched),
            touched_splits=touched,
            manifest=new_manifest,
        )

        index_audit = None
        if index_root is not None:
            idx_manifest = delete_from_ivf_index_version(
                spark,
                index_root,
                del_ids,
                keep_versions=keep_versions,
                broadcast_cap=broadcast_cap,
            )
            index_audit = dict(idx_manifest.get("deleted", {}))
            index_audit["version"] = idx_manifest.get("version")
            index_audit["manifest"] = idx_manifest

        if verify:
            _verify_absent(
                spark, release_root, index_root, del_ids, id_col,
                split_col, release_audit, index_audit,
            )
        return {
            "requested": int(n_requested),
            "release": release_audit,
            "index": index_audit,
        }
    finally:
        del_ids.unpersist()
        if pairs is not None:
            pairs.unpersist()


def ingest_documents(
    spark: SparkSession,
    release_root: str,
    updates: DataFrame,
    index_root: str | None = None,
    embeddings: DataFrame | None = None,
    id_col: str = "doc_id",
    split_col: str = "split",
    vec_col: str = "embedding",
    keep_versions: int | None = None,
    broadcast_cap: int = 5_000_000,
    check_id_migration: bool = False,
    allow_new_columns: bool = False,
    verify: bool = False,
) -> dict:
    """The inverse of :func:`takedown_documents`: land a batch of
    documents in BOTH surfaces — upsert ``updates`` into the CURRENT
    release (matched ids replaced, new ids inserted — the
    partition-pruned ``write_release_merge``) and upsert their
    ``embeddings`` into the CURRENT index version
    (:func:`~.vecindex.upsert_into_ivf_index_version` — changed ids
    move lists, payload-identical rows stay put). Together with
    takedown this completes the document lifecycle: ingest / refresh
    / remove, each one audited call per wave.

    Order is release first, then index — the opposite failure mode to
    takedown, chosen for the same reason: a crash between the halves
    may leave new documents briefly unsearchable (content published,
    postings pending), never postings that point at unpublished
    content. Both halves are idempotent (merge detects byte-identical
    partitions by fingerprint; upsert detects payload-identical
    postings), so replaying the same call after any partial failure
    completes exactly the missing half and publishes nothing twice.

    ``embeddings`` is a frame of (``id_col``, ``vec_col``); when
    omitted and ``updates`` itself carries ``vec_col``, the pair is
    derived from it (the release schema then must also carry that
    column, or the merge refuses the schema fork loudly).

    Returns ``{"release": {...}, "index": {...}|None}`` — each half's
    audit with its manifest and a ``noop_replay`` flag."""
    from .pipeline import read_release, write_release_merge

    if not split_col:
        raise ValueError(
            "ingest_documents: split_col must name the release's "
            "partition column (write_release_merge needs a "
            "partitioned release); index-only ingestion goes through "
            "upsert_into_ivf_index_version directly"
        )
    if index_root is not None and embeddings is None:
        if vec_col not in updates.columns:
            raise ValueError(
                "ingest_documents: index_root given but no embeddings "
                f"frame and updates lack {vec_col!r} — pass "
                "embeddings=(id, vector) explicitly"
            )
        embeddings = updates.select(F.col(id_col), F.col(vec_col))

    _, cur_manifest = read_release(spark, release_root)
    cur_version = cur_manifest.get("version")
    new_manifest = write_release_merge(
        updates,
        release_root,
        id_col=id_col,
        split_col=split_col,
        keep_versions=keep_versions,
        check_id_migration=check_id_migration,
        allow_new_columns=allow_new_columns,
        spark_for_fs=spark,
    )
    release_noop = new_manifest.get("version") == cur_version
    release_audit = {
        "version": new_manifest.get("version"),
        "noop_replay": release_noop,
        "touched_splits": sorted(
            new_manifest.get("incremental", {}).get("rewritten", [])
            + new_manifest.get("incremental", {}).get("removed", [])
        )
        if not release_noop
        else [],
        "manifest": new_manifest,
    }

    index_audit = None
    if index_root is not None:
        from .vecindex import upsert_into_ivf_index_version

        idx_manifest = upsert_into_ivf_index_version(
            spark,
            index_root,
            embeddings,
            id_col=id_col,
            vec_col=vec_col,
            keep_versions=keep_versions,
            broadcast_cap=broadcast_cap,
        )
        index_audit = dict(idx_manifest.get("upserted", {}))
        index_audit["version"] = idx_manifest.get("version")
        index_audit["manifest"] = idx_manifest

    if verify:
        _verify_present(
            spark, release_root, index_root, updates, embeddings,
            id_col, split_col, release_audit, index_audit,
        )
    return {"release": release_audit, "index": index_audit}


def _verify_present(
    spark, release_root, index_root, updates, embeddings, id_col,
    split_col, release_audit, index_audit,
) -> None:
    """Partition-pruned post-condition for ingest: every update id is
    present in the new CURRENT release (update rows live only in the
    merge's touched splits), and every CHANGED embedding id has a
    posting in the upsert's touched lists (unchanged ids were already
    present — that is what unchanged means)."""
    from .pipeline import read_release
    from .vecindex import read_ivf_index_current

    cur, _ = read_release(spark, release_root)
    ids = updates.select(id_col).distinct()
    n_ids = ids.count()
    scan = cur
    touched = release_audit.get("touched_splits") or []
    if split_col and touched and not release_audit["noop_replay"]:
        scan = cur.where(
            F.col(split_col).cast("string").isin(
                [t for t in touched if t != "__null__"]
            )
            | (
                F.col(split_col).isNull()
                if "__null__" in touched
                else F.lit(False)
            )
        )
    n_found = (
        scan.select(id_col)
        .join(F.broadcast(ids), id_col, "left_semi")
        .count()
    )
    if n_found != n_ids:
        raise AssertionError(
            f"ingest verify: {n_ids - n_found} of {n_ids} update ids "
            f"missing from the release under {release_root}"
        )
    if index_root is not None and index_audit is not None:
        idx = read_ivf_index_current(spark, index_root)
        postings = idx.postings
        cids = index_audit.get("touched_lists") or []
        if cids:
            postings = postings.where(F.col("ivf_cid").isin(list(cids)))
        n_changed = int(index_audit.get("n_changed", 0))
        if n_changed:
            # changed ids = the upsert's insertions/replacements; all
            # of their postings live in the touched lists
            vec_ids = embeddings.select(
                F.col(id_col).alias("id")
            ).distinct()
            n_post = (
                postings.select("id")
                .join(F.broadcast(vec_ids), "id", "left_semi")
                .count()
            )
            if n_post < n_changed:
                raise AssertionError(
                    f"ingest verify: expected ≥{n_changed} changed "
                    f"postings in the touched lists, found {n_post} "
                    f"under {index_root}"
                )


def _verify_absent(
    spark, release_root, index_root, del_ids, id_col, split_col,
    release_audit, index_audit,
) -> None:
    """Partition-pruned post-condition: no requested id survives in
    the new CURRENT of either root. Reads only the partitions/lists
    the deletes touched (ids lived nowhere else in the base version,
    and every other partition carried forward file-identical)."""
    from .pipeline import read_release
    from .vecindex import read_ivf_index_current

    cur, _ = read_release(spark, release_root)
    scan = cur.select(id_col)
    touched = release_audit.get("touched_splits") or []
    if split_col and touched:
        scan = cur.where(
            F.col(split_col).cast("string").isin(
                [t for t in touched if t != "__null__"]
            )
            | (
                F.col(split_col).isNull()
                if "__null__" in touched
                else F.lit(False)
            )
        ).select(id_col)
    leak = scan.join(
        F.broadcast(del_ids.withColumnRenamed("id", id_col)),
        id_col,
        "left_semi",
    ).head(1)
    if leak:
        raise AssertionError(
            f"takedown verify: id {leak[0][id_col]!r} still present in "
            f"the release under {release_root}"
        )
    if index_root is not None and index_audit is not None:
        idx = read_ivf_index_current(spark, index_root)
        postings = idx.postings
        cids = index_audit.get("touched_lists") or []
        if cids:
            postings = postings.where(F.col("ivf_cid").isin(list(cids)))
        leak = postings.select("id").join(
            F.broadcast(del_ids), "id", "left_semi"
        ).head(1)
        if leak:
            raise AssertionError(
                f"takedown verify: id {leak[0]['id']!r} still has "
                f"postings in the index under {index_root}"
            )
