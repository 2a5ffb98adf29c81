"""Versioned database migrations: build → package → publish → restore.

Reference: ``src/genegraph/migration.clj`` — build the whole Jena TDB
database from base data + batched events + stream catch-up at a
versioned path (``build-database``, :64-93), tar it
(``compress-database``), upload the versioned archive to a bucket
(``send-database``), and on the serving side ``retrieve-migration`` /
``decompress-database`` with ``populate-data-vol-if-needed`` skipping
the download when the data volume already holds a database
(:158-170). ``load-stream-data`` (:172-192) refreshes an existing
database from the streams, optionally rebuilding from scratch.

Spark-first: the "database" is the named-graph store (a parquet
dataset + commit manifests), so a migration artifact is just that
directory packaged with a manifest of its own — no TDB rebuild step,
and restore is unpack-and-read. Packaging/unpacking are driver-side
file operations exactly like the reference's ``tar`` shell-outs; the
"bucket" is any directory-like destination (the sandbox stands in for
object storage — the paths, versioning, and idempotence semantics are
what this module pins down).

Version ids: the reference stamps ``yyyy-MM-dd'T'HHmm`` from the wall
clock when ``env/data-version`` is unset (:27-31, :116-121). Here the
caller passes an explicit ``version`` (the data-version path) or the
id derives from the store's last commit — deterministic, so replays
and tests never race the clock.
"""

from __future__ import annotations

import json
import os
import shutil
import tarfile

from ..sinks.named_graph import NamedGraphStore


def version_id(store: NamedGraphStore, version: str | None = None) -> str:
    """Explicit data-version if given, else ``commit-<n>`` from the
    store head (``get-version-id``, migration.clj:116-121, with the
    wall-clock fallback replaced by a deterministic one)."""
    if version is not None:
        return version
    last = store.last_commit()
    if last is None:
        raise ValueError("empty store and no explicit version")
    return f"commit-{last}"


def compress_database(source_dir: str, target_archive: str) -> str:
    """Package a built database directory into a tarball
    (``compress-database``, migration.clj:95-102)."""
    os.makedirs(os.path.dirname(target_archive) or ".", exist_ok=True)
    with tarfile.open(target_archive, "w:gz") as tar:
        tar.add(source_dir, arcname=".")
    return target_archive


def send_database(bucket_dir: str, archive: str, version: str) -> str:
    """Publish the archive under the bucket as ``<version>.tar.gz``
    (``send-database``, migration.clj:104-113; object storage stands
    behind a directory interface here)."""
    os.makedirs(bucket_dir, exist_ok=True)
    dest = os.path.join(bucket_dir, f"{version}.tar.gz")
    shutil.copyfile(archive, dest)
    return dest


def create_migration(
    spark, sf_dir: str, base_dir: str, bucket_dir: str,
    version: str | None = None,
) -> dict:
    """Populate a new database at a versioned path, package, publish
    (``create-migration``, migration.clj:123-132). Returns the version
    id + artifact paths."""
    from .pipeline import run_to_store

    os.makedirs(base_dir, exist_ok=True)
    # build first into a staging path; the version may derive from the
    # built store's head commit. A leftover staging dir from a failed
    # run would silently absorb a second merge commit (nondeterministic
    # version ids + divergent lineage) — always start clean.
    staging = os.path.join(base_dir, "_staging")
    if os.path.exists(staging):
        shutil.rmtree(staging)
    run_to_store(spark, sf_dir, staging)
    store = NamedGraphStore(spark, staging)
    vid = version_id(store, version)
    dest_db = os.path.join(base_dir, vid)
    if os.path.exists(dest_db):
        raise FileExistsError(f"migration {vid} already built at {dest_db}")
    os.rename(staging, dest_db)
    archive = compress_database(dest_db, dest_db + ".tar.gz")
    published = send_database(bucket_dir, archive, vid)
    with open(os.path.join(bucket_dir, f"{vid}.json"), "w") as f:
        json.dump({"version": vid, "archive": os.path.basename(published)}, f)
    return {"version": vid, "database": dest_db, "archive": published}


def retrieve_migration(bucket_dir: str, version: str, target_dir: str) -> str:
    """Pull a published archive out of the bucket
    (``retrieve-migration``, migration.clj:139-147)."""
    os.makedirs(target_dir, exist_ok=True)
    name = f"{version}.tar.gz"
    src = os.path.join(bucket_dir, name)
    if not os.path.exists(src):
        raise FileNotFoundError(src)
    dest = os.path.join(target_dir, name)
    shutil.copyfile(src, dest)
    return dest


def decompress_database(target_dir: str, archive_path: str) -> bool:
    """Unpack a retrieved archive (``decompress-database``,
    migration.clj:149-156). Link members are rejected outright (a
    symlink created early can make a later member's lexical path check
    pass while escaping the target) and extraction runs under the
    stdlib 'data' filter, which independently refuses path escapes."""
    target_real = os.path.realpath(target_dir)
    with tarfile.open(archive_path, "r:gz") as tar:
        for m in tar.getmembers():
            if m.issym() or m.islnk():
                raise ValueError(f"archive contains a link member: {m.name}")
            dest = os.path.realpath(os.path.join(target_dir, m.name))
            if not (dest == target_real or dest.startswith(target_real + os.sep)):
                raise ValueError(f"archive member escapes target: {m.name}")
        tar.extractall(target_dir, filter="data")
    return True


def populate_data_vol_if_needed(
    spark, data_vol: str, bucket_dir: str, version: str
) -> bool:
    """Download + unpack ONLY when the data volume does not already
    hold a store (``populate-data-vol-if-needed``, migration.clj:
    158-170 — the reference checks for the ``tdb`` directory; here the
    store's own manifest presence is the signal). Returns True when a
    restore happened."""
    store = NamedGraphStore(spark, data_vol)
    if store.exists():
        return False
    archive = retrieve_migration(bucket_dir, version, data_vol)
    decompress_database(data_vol, archive)
    os.remove(archive)
    return True


def load_stream_data(
    spark, sf_dir: str, dest_path: str, bucket_dir: str | None = None,
    version: str | None = None, from_scratch: bool = False,
) -> dict:
    """Refresh a database from the source streams
    (``load-stream-data``, migration.clj:172-192): restore the volume
    if empty (when a bucket+version are given), optionally reset to
    from-scratch, then run the incremental pipeline to catch up — the
    run_to_store merge is idempotent, so re-processing already-seen
    graphs is a no-op, the offset-reset semantics of the reference."""
    from .pipeline import run_to_store

    if from_scratch:
        # a restore would be deleted immediately below — skip it
        if os.path.exists(dest_path):
            shutil.rmtree(dest_path)
    elif bucket_dir is not None and version is not None:
        populate_data_vol_if_needed(spark, dest_path, bucket_dir, version)
    outcome = run_to_store(spark, sf_dir, dest_path)
    store = NamedGraphStore(spark, dest_path)
    return {"commit": store.last_commit(), "outcome": outcome}
