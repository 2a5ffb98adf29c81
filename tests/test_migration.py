"""Versioned migration workflow (migration.clj analog)."""

from __future__ import annotations

import os
import tarfile

import pytest

from genegraph_spark.plans import migration as MIG
from genegraph_spark.sinks.named_graph import NamedGraphStore


@pytest.fixture(scope="module")
def artifact(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("mig_base")
    bucket = tmp_path_factory.mktemp("mig_bucket")
    info = MIG.create_migration(
        spark, sf_dir, str(base), str(bucket), version="v2024-test"
    )
    return info, str(bucket)


class TestCreateMigration:
    def test_build_package_publish(self, spark, artifact):
        info, bucket = artifact
        assert info["version"] == "v2024-test"
        assert os.path.exists(info["archive"])
        assert os.path.basename(info["archive"]) == "v2024-test.tar.gz"
        # the built database is a readable store
        store = NamedGraphStore(spark, info["database"])
        assert store.triples().count() > 0
        # archive holds the store files
        with tarfile.open(info["archive"]) as tar:
            names = tar.getnames()
        assert any("manifest" in n or "data" in n for n in names)

    def test_version_collision_refuses(self, spark, sf_dir, artifact):
        info, bucket = artifact
        base = os.path.dirname(info["database"])
        with pytest.raises(FileExistsError):
            MIG.create_migration(spark, sf_dir, base, bucket,
                                 version="v2024-test")


class TestRestore:
    def test_restore_round_trips(self, spark, artifact, tmp_path):
        info, bucket = artifact
        vol = str(tmp_path / "data_vol")
        restored = MIG.populate_data_vol_if_needed(
            spark, vol, bucket, "v2024-test"
        )
        assert restored is True
        src = NamedGraphStore(spark, info["database"])
        dst = NamedGraphStore(spark, vol)
        assert dst.triples().count() == src.triples().count()
        assert dst.last_commit() == src.last_commit()
        # second call: the volume is populated → no-op
        assert MIG.populate_data_vol_if_needed(
            spark, vol, bucket, "v2024-test"
        ) is False

    def test_missing_version_raises(self, artifact, tmp_path):
        _, bucket = artifact
        with pytest.raises(FileNotFoundError):
            MIG.retrieve_migration(bucket, "no-such-version",
                                   str(tmp_path / "x"))

    def test_hostile_archive_member_rejected(self, tmp_path):
        evil = tmp_path / "evil.tar.gz"
        payload = tmp_path / "p.txt"
        payload.write_text("x")
        with tarfile.open(evil, "w:gz") as tar:
            tar.add(payload, arcname="../escape.txt")
        with pytest.raises(ValueError):
            MIG.decompress_database(str(tmp_path / "out"), str(evil))


class TestLoadStreamData:
    def test_catch_up_is_idempotent(self, spark, sf_dir, artifact, tmp_path):
        info, bucket = artifact
        vol = str(tmp_path / "vol2")
        r1 = MIG.load_stream_data(
            spark, sf_dir, vol, bucket_dir=bucket, version="v2024-test"
        )
        n1 = NamedGraphStore(spark, vol).triples().count()
        # re-running the same streams over a restored volume changes
        # nothing (merge idempotence = the offset-reset semantics)
        MIG.load_stream_data(spark, sf_dir, vol)
        n2 = NamedGraphStore(spark, vol).triples().count()
        assert n1 == n2
        assert r1["commit"] is not None

    def test_version_id_derivation(self, spark, artifact):
        info, _ = artifact
        store = NamedGraphStore(spark, info["database"])
        assert MIG.version_id(store).startswith("commit-")
        assert MIG.version_id(store, "explicit") == "explicit"
