"""Manifest-based snapshot sink — atomic publish and version-pinned
reads over plain parquet, the minimal table-format core (what Delta /
Iceberg provide) built from two primitives every filesystem has:
write-then-rename and explicit file lists.

Why a 100 TB pipeline needs it: a partitioned-append directory is not
a consistent table — a reader that lists files mid-write sees a torn
snapshot, and there is no way to re-read yesterday's state after
today's append. The manifest fixes both:

- **Atomic publish**: data files land first (invisible to readers —
  nothing references them), then the version manifest (the list of
  member files) is written to a temp name and ``os.rename``d into
  place. Readers resolve the manifest FIRST, then read exactly the
  files it names; they can never observe a half-written version.
- **Time travel**: every version's manifest is retained, so
  ``read_snapshot(..., version=N)`` reproduces any historical state
  byte-for-byte — the audit/rollback/reproducible-training-run
  primitive.
- **Optimistic concurrency**: the rename fails (manifest exists) if
  another writer published the same version first — detect, reload,
  retry; writers never corrupt, they only lose races.

Scale notes: the manifest holds file *names*, so its size is
O(files), not O(rows); appends reuse previous data files by reference
(an append of 1 GB to a 100 TB table writes 1 GB + a few KB of
manifest). At object-store scale the rename becomes a
put-if-absent — the same protocol, same guarantees.

Reference parity: the reference's sink rewrites one JSON file per
batch (file_output_manager.py:34-69) — its "snapshot" is the whole
file. This is that semantic made safe at scale.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..errors import InvalidOutputDirectoryError

_MANIFEST_DIR = "manifests"
_DATA_DIR = "data"


def _manifest_path(table_path: str, version: int) -> str:
    return os.path.join(table_path, _MANIFEST_DIR, f"v{version:08d}.json")


def list_versions(table_path: str) -> list[int]:
    mdir = os.path.join(table_path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in os.listdir(mdir):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _load_manifest(table_path: str, version: int) -> dict:
    with open(_manifest_path(table_path, version)) as fh:
        return json.load(fh)


def write_snapshot(
    df: DataFrame, table_path: str, mode: str = "append"
) -> int:
    """Publish a new table version containing ``df`` (mode="append":
    plus every file of the previous version; mode="overwrite": only
    ``df``). Returns the published version number.

    Data files are written under ``data/`` with a unique prefix and
    become visible only when the version manifest renames into place —
    a reader concurrent with this call sees either the old version or
    the new one, never a mix.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported snapshot mode: {mode}")
    if os.path.exists(table_path) and not os.path.isdir(table_path):
        raise InvalidOutputDirectoryError(table_path)
    os.makedirs(os.path.join(table_path, _MANIFEST_DIR), exist_ok=True)
    data_dir = os.path.join(table_path, _DATA_DIR)
    os.makedirs(data_dir, exist_ok=True)

    # land the new data files under an unpublished unique prefix
    batch = uuid.uuid4().hex[:12]
    staging = os.path.join(table_path, f"_staging_{batch}")
    df.write.mode("overwrite").parquet(staging)
    new_files = []
    for f in sorted(os.listdir(staging)):
        if f.endswith(".parquet"):
            dst = f"{batch}-{f}"
            shutil.move(os.path.join(staging, f), os.path.join(data_dir, dst))
            new_files.append(dst)
    shutil.rmtree(staging, ignore_errors=True)

    while True:
        versions = list_versions(table_path)
        prev = versions[-1] if versions else None
        files = list(new_files)
        if mode == "append" and prev is not None:
            files = _load_manifest(table_path, prev)["files"] + files
        version = (prev if prev is not None else 0) + 1
        manifest = {"version": version, "mode": mode, "files": files}
        tmp = os.path.join(
            table_path, _MANIFEST_DIR, f"_tmp_{batch}_{version}.json"
        )
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        target = _manifest_path(table_path, version)
        # optimistic concurrency: lose the race -> recompute against
        # the winner's manifest and retry with the next version number
        if os.path.exists(target):
            os.remove(tmp)
            continue
        try:
            os.rename(tmp, target)
        except OSError:
            os.remove(tmp)
            continue
        return version


def read_snapshot(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Read one committed version (default: latest) — exactly the
    files its manifest names, regardless of what later writers have
    landed since."""
    versions = list_versions(table_path)
    if not versions:
        raise InvalidOutputDirectoryError(
            f"{table_path}: no committed snapshot versions"
        )
    v = versions[-1] if version is None else version
    if v not in versions:
        raise InvalidOutputDirectoryError(
            f"{table_path}: version {v} not committed (have {versions})"
        )
    files = _load_manifest(table_path, v)["files"]
    data_dir = os.path.join(table_path, _DATA_DIR)
    return spark.read.parquet(*[os.path.join(data_dir, f) for f in files])


def vacuum(table_path: str, keep_last: int = 1) -> dict:
    """Retire history: keep the newest ``keep_last`` versions, delete
    older manifests and every data file no kept version references.

    The deletion order is the safe one — manifests first (the moment a
    version's manifest is gone, no reader can resolve it), then the
    now-unreferenced data files — so a reader holding an already-
    resolved file list is the only race, the same contract as Delta's
    VACUUM retention window. Returns counts for audit logging.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = list_versions(table_path)
    keep = set(versions[-keep_last:])
    referenced: set[str] = set()
    for v in keep:
        referenced.update(_load_manifest(table_path, v)["files"])
    dropped_manifests = 0
    for v in versions:
        if v not in keep:
            os.remove(_manifest_path(table_path, v))
            dropped_manifests += 1
    data_dir = os.path.join(table_path, _DATA_DIR)
    dropped_files = 0
    for f in os.listdir(data_dir) if os.path.isdir(data_dir) else []:
        if f.endswith(".parquet") and f not in referenced:
            os.remove(os.path.join(data_dir, f))
            dropped_files += 1
    return {
        "kept_versions": sorted(keep),
        "dropped_manifests": dropped_manifests,
        "dropped_files": dropped_files,
    }
