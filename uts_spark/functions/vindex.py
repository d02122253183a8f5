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
    append_snapshot,
    commit_version,
    current_version,
    list_versions,
    read_version,
)

_SORT = ("band", "grp", "bucket")


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
    return commit_version(
        path, [ddir], "build", None, n_rows,
        _config_meta(fingerprint, n, k, bands, n_grps),
    )


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
    dir once, commit manifest = parent dirs + delta. Batch-sized; a
    commit conflict retries the manifest only (inside
    append_snapshot) — file adds commute, the sketch never reruns."""
    _check_config(path, n=n, k=k, bands=bands, n_grps=n_grps)
    rows = _rows(batch, text_col, id_col, n, k, bands, n_grps)
    return append_snapshot(
        rows.repartition(4, "band", "grp"),
        path,
        operation="append",
        meta=_config_meta(fingerprint, n, k, bands, n_grps),
        sort_cols=_SORT,
    )


def _rewrite_with_retry(
    spark, path: str, make_rows, operation: str,
    fingerprint: str, cfg: dict, max_retries: int = 5,
) -> int:
    """Shared rewrite commit loop (delete / compact): compute the new
    row set AGAINST the current version, write it to a fresh delta
    dir, CAS-commit; on conflict, RECOMPUTE against the new current
    (a rewrite does not commute with whatever landed in between)."""
    last: Exception | None = None
    for _ in range(max_retries):
        parent = current_version(path)
        rows = make_rows(read_version(spark, path, parent))
        ddir = _write_delta_dir(rows, path, _SORT)
        n_rows = spark.read.parquet(ddir).count()
        try:
            return commit_version(
                path, [ddir], operation, parent, n_rows,
                _config_meta(fingerprint, **cfg),
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
    """Erasure as a copy-on-write snapshot: current rows LEFT ANTI the
    deleted-id frame (the ids never touch the driver), committed via
    CAS. Unlike the marker family's reset, earlier versions REMAIN
    READABLE until vacuum removes them — the GDPR contract is
    therefore vacuum's: erase-then-vacuum is the complete verb
    sequence, and the table's retention policy must say so."""
    _check_config(path, n=n, k=k, bands=bands, n_grps=n_grps)
    idf = deleted_ids.toDF("id") if len(deleted_ids.columns) == 1 else deleted_ids

    def make_rows(cur):
        return cur.join(idf.select("id"), "id", "left_anti").repartition(
            4, "band", "grp"
        )

    return _rewrite_with_retry(
        spark, path, make_rows, "delete", fingerprint,
        dict(n=n, k=k, bands=bands, n_grps=n_grps),
    )


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
