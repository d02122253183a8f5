"""Snapshot-committed index maintenance (VERDICT r8 #4): the MinHash
band family's full CRUD routed through the versioned table's ATOMIC
MANIFEST COMMIT (sources/versioned.py) instead of the rename-swap +
O_EXCL pending-marker protocol.

Why this exists: the marker protocol is POSIX-local-FS only — object
storage has no rename and no O_EXCL, so at 100 TB none of those
primitives exist. The versioned table's commit point is a single
PUT-if-absent of the next version's manifest (os.link locally, a
conditional PUT on object storage), which gives:

- **snapshot isolation for readers** for free: a reader resolves a
  manifest once and reads only that manifest's immutable directories —
  no torn ticks, no version-pinned file-census sidecar needed;
- **multi-writer safety by OPTIMISTIC CONCURRENCY**: two concurrent
  ticks race the same next-version manifest; exactly one lands, the
  loser gets :class:`~uts_spark.sources.versioned.VersionConflictError`
  and retries — an APPEND retries with its already-written delta files
  (file adds commute; the data job never reruns), a REWRITE (delete /
  compact) recomputes against the new current. No lock is ever held.

Cost shapes (the 100 TB contract):

- build: one corpus-sized sketch + write — same as the marker family;
- append: batch-sized delta dir + an O(1) manifest commit (the
  Iceberg fast-append) — the table is NEVER rewritten;
- delete: a table-grain copy-on-write rewrite here (the minimal
  correct form, same simplification merge_upsert documents);
  production narrows the rewrite to files whose stats admit the
  deleted ids — the commit protocol is identical;
- compact: rewrite the union into one clustered dir — the operation
  is BY NATURE table-sized;
- probe: manifest-resolved read + the SAME candidate/verify kernel as
  the marker family (dedup.minhash_index_probe with scan=). Pruning
  note: snapshot dirs are not directory-partitioned by (band, grp);
  rows are cluster-SORTED on write instead, so parquet row-group
  min/max stats prune the selective probe scan — the same file-stats
  pruning a manifest-based format uses at scale.

Reference parity: none (uts.ts has no persistence); north-star
surface, LLM-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from uts_spark.functions.dedup import (
    _band_bucket_rows,
    doc_shingle_arrays_portable,
    minhash_index_probe,
    minhash_signatures_portable,
)
from uts_spark.sources.versioned import (
    VersionConflictError,
    _manifest_dirs,
    _write_delta_dir,
    commit_version,
    current_version,
    list_versions,
    read_version,
)

_SORT = ("band", "grp", "bucket")


def _id_stats(spark, ddir: str) -> list[int]:
    """(min_id, max_id) of a delta directory — recorded on the
    manifest so erasure can PRUNE: a dir whose id range admits none
    of the deleted ids is carried into the new version untouched
    (the file-stats pruning real table formats do; here at dir
    granularity because dirs are this format's file unit)."""
    row = spark.read.parquet(ddir).agg(
        F.min("id").alias("lo"), F.max("id").alias("hi")
    ).first()
    return [int(row["lo"]), int(row["hi"])]


def _rows(df: DataFrame, text_col: str, id_col: str, n, k, bands, n_grps):
    sig = minhash_signatures_portable(
        doc_shingle_arrays_portable(df, text_col, id_col, n), k
    )
    return (
        _band_bucket_rows(sig, k, bands)
        .select("id", "band", "bucket")
        .withColumn("grp", F.pmod(F.xxhash64("bucket"), F.lit(n_grps)))
    )


def _config_meta(fingerprint: str, n, k, bands, n_grps) -> dict:
    return {
        "fingerprint": fingerprint,
        "n": n, "k": k, "bands": bands, "n_grps": n_grps,
    }


def vindex_config(path: str) -> dict | None:
    """The index config+fingerprint from the CURRENT manifest (every
    commit carries it forward — the manifest is the single source of
    truth; there is no separate _INDEX_MANIFEST.json here)."""
    versions = list_versions(path)
    if not versions:
        return None
    m = versions[-1]
    return {
        key: m[key]
        for key in ("fingerprint", "n", "k", "bands", "n_grps")
        if key in m
    }


def _check_config(path: str, **config) -> None:
    m = vindex_config(path)
    if m is None:
        return
    for key, val in config.items():
        if key in m and m[key] != val:
            raise ValueError(
                f"snapshot minhash index at {path}: config mismatch — "
                f"index has {key}={m[key]}, caller asked {key}={val}"
            )


def minhash_vindex_build(
    df: DataFrame,
    text_col: str,
    id_col: str,
    path: str,
    fingerprint: str = "",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    n_grps: int = 16,
) -> int:
    """Version 0: the full band-row table as one snapshot commit (the
    delta-dir + CAS-commit shape, so even the BUILD is safe against a
    concurrent builder — one wins, the other conflicts cleanly)."""
    rows = _rows(df, text_col, id_col, n, k, bands, n_grps)
    ddir = _write_delta_dir(rows.repartition(4, "band", "grp"), path, _SORT)
    spark = df.sparkSession
    n_rows = spark.read.parquet(ddir).count()
    meta = _config_meta(fingerprint, n, k, bands, n_grps)
    meta["dir_stats"] = {ddir: _id_stats(spark, ddir)}
    return commit_version(path, [ddir], "build", None, n_rows, meta)


def minhash_vindex_append(
    batch: DataFrame,
    text_col: str,
    id_col: str,
    path: str,
    fingerprint: str = "",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    n_grps: int = 16,
) -> int:
    """Fast append: sketch ONLY the batch, write its rows to a delta
    dir once, commit manifest = parent dirs + delta (with the delta's
    id-range stats — erasure's pruning input). Batch-sized; a commit
    conflict retries the manifest only — file adds commute, the
    sketch never reruns."""
    _check_config(path, n=n, k=k, bands=bands, n_grps=n_grps)
    spark = batch.sparkSession
    rows = _rows(batch, text_col, id_col, n, k, bands, n_grps)
    ddir = _write_delta_dir(
        rows.repartition(4, "band", "grp"), path, _SORT
    )
    n_new = spark.read.parquet(ddir).count()
    stats = _id_stats(spark, ddir)
    last: Exception | None = None
    for _ in range(5):
        versions = {m["version"]: m for m in list_versions(path)}
        parent = max(versions) if versions else None
        pm = versions[parent] if parent is not None else {}
        meta = _config_meta(fingerprint, n, k, bands, n_grps)
        meta["dir_stats"] = {**pm.get("dir_stats", {}), ddir: stats}
        try:
            return commit_version(
                path,
                (_manifest_dirs(pm) if pm else []) + [ddir],
                "append",
                parent,
                pm.get("n_rows", 0) + n_new,
                meta,
            )
        except VersionConflictError as e:
            last = e
    raise last  # type: ignore[misc]


def _rewrite_with_retry(
    spark, path: str, make_rows, operation: str,
    fingerprint: str, cfg: dict, max_retries: int = 5,
) -> int:
    """Shared rewrite commit loop (compact): compute the new row set
    AGAINST the current version, write it to a fresh delta dir,
    CAS-commit; on conflict, RECOMPUTE against the new current (a
    rewrite does not commute with whatever landed in between)."""
    last: Exception | None = None
    for _ in range(max_retries):
        parent = current_version(path)
        rows = make_rows(read_version(spark, path, parent))
        ddir = _write_delta_dir(rows, path, _SORT)
        n_rows = spark.read.parquet(ddir).count()
        meta = _config_meta(fingerprint, **cfg)
        meta["dir_stats"] = {ddir: _id_stats(spark, ddir)}
        try:
            return commit_version(
                path, [ddir], operation, parent, n_rows, meta
            )
        except VersionConflictError as e:
            last = e
    raise last  # type: ignore[misc]


def minhash_vindex_delete(
    spark,
    deleted_ids: DataFrame,
    path: str,
    fingerprint: str = "",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    n_grps: int = 16,
) -> int:
    """Erasure as a PRUNED copy-on-write snapshot (round-10 candidate
    pulled forward): the manifest's per-dir (min_id, max_id) stats
    decide which dirs the erasure can possibly touch — one tiny agg
    over the DELETED frame (never the table) marks each dir touched
    iff some deleted id falls inside its range; untouched dirs carry
    into the new manifest BY REFERENCE, only the touched dirs rewrite
    through the left-anti join. Cost ∝ touched data, the deleted-id
    frame stays distributed, and a service whose appends arrive in
    id-ordered batches (the common case) erases at batch-directory
    granularity — the Iceberg file-stats erasure shape at this
    format's dir-sized file unit. On a CAS conflict the whole
    decision recomputes against the new current. Earlier versions
    REMAIN READABLE until vacuum — erase-then-vacuum is the complete
    GDPR sequence."""
    _check_config(path, n=n, k=k, bands=bands, n_grps=n_grps)
    idf = (
        deleted_ids.toDF("id")
        if len(deleted_ids.columns) == 1
        else deleted_ids
    ).select("id")

    last: Exception | None = None
    for _ in range(5):
        versions = {m["version"]: m for m in list_versions(path)}
        parent = max(versions) if versions else None
        if parent is None:
            raise ValueError(f"snapshot index at {path}: nothing to delete")
        pm = versions[parent]
        dirs = _manifest_dirs(pm)
        stats = pm.get("dir_stats", {})
        if set(stats) >= set(dirs):
            # one pass over the DELETED frame: which dir ranges admit
            # at least one deleted id (bounded by n_dirs columns)
            hit_row = idf.agg(
                *[
                    F.max(
                        F.col("id").between(
                            F.lit(stats[d][0]), F.lit(stats[d][1])
                        )
                    ).alias(f"h{i}")
                    for i, d in enumerate(dirs)
                ]
            ).first()
            touched = [
                d for i, d in enumerate(dirs) if bool(hit_row[f"h{i}"])
            ]
        else:
            touched = list(dirs)  # stats-less legacy manifest: rewrite all
        untouched = [d for d in dirs if d not in set(touched)]
        if not touched:
            return parent  # nothing to erase — current version stands

        kept = (
            spark.read.parquet(*touched)
            .join(idf, "id", "left_anti")
            .repartition(4, "band", "grp")
        )
        ddir = _write_delta_dir(kept, path, _SORT)
        n_kept = spark.read.parquet(ddir).count()
        # exact rows: parent total - touched rows + kept rows
        n_touched = spark.read.parquet(*touched).count()
        n_rows = pm["n_rows"] - n_touched + n_kept
        meta = _config_meta(fingerprint, n=n, k=k, bands=bands, n_grps=n_grps)
        meta["dir_stats"] = {
            **{d: stats[d] for d in untouched if d in stats},
            ddir: _id_stats(spark, ddir) if n_kept else [0, -1],
        }
        meta["pruned_dirs"] = len(untouched)
        try:
            return commit_version(
                path,
                untouched + [ddir],
                "delete",
                parent,
                n_rows,
                meta,
            )
        except VersionConflictError as e:
            last = e
    raise last  # type: ignore[misc]


def minhash_vindex_compact(
    spark,
    path: str,
    fingerprint: str = "",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    n_grps: int = 16,
) -> int:
    """Compaction as a snapshot: rewrite the (possibly many-dir append
    chain's) union into ONE clustered dir and CAS-commit it — after
    which vacuum can drop the superseded chain. Time travel to
    PRE-compaction versions keeps working until vacuum (contrast the
    marker family, where compaction physically replaces files and
    must RESET history)."""

    def make_rows(cur):
        return cur.repartition(4, "band", "grp")

    return _rewrite_with_retry(
        spark, path, make_rows, "compact", fingerprint,
        dict(n=n, k=k, bands=bands, n_grps=n_grps),
    )


def minhash_vindex_probe(
    spark,
    path: str,
    new_docs: DataFrame,
    old_docs: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    n_grps: int = 16,
    version: int | None = None,
) -> DataFrame:
    """Probe at the current (or a pinned) snapshot: resolve the
    manifest's immutable dir list and run the SHARED candidate/verify
    kernel (dedup.minhash_index_probe with scan=). Snapshot isolation
    is structural — concurrent commits cannot change the resolved dir
    list mid-read."""
    _check_config(path, n=n, k=k, bands=bands, n_grps=n_grps)
    scan = read_version(spark, path, version)
    return minhash_index_probe(
        spark, path, new_docs, old_docs, text_col, id_col,
        n=n, k=k, bands=bands, threshold=threshold, n_grps=n_grps,
        scan=scan,
    )
