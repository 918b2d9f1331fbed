"""S3 option plumbing (ref table/LanceCatalogFactory.java:77-111 /
LanceCatalog.java:743-773, unit surface of LanceCatalogS3Test.java:165-355),
reference-fixture layout compatibility, and the epoch-in-manifest
exactly-once guarantee."""

from __future__ import annotations

import os

import pytest

from flink_connector_lance_spark.options import DatasetOptions, S3Options, is_s3_path
from flink_connector_lance_spark.sources import fragments as FR
from flink_connector_lance_spark.sources.catalog import DatasetCatalog, Unsupported

REF_FIXTURES = "/root/reference/test-data"


class TestS3Options:
    def test_scheme_detection(self):
        assert is_s3_path("s3://bucket/warehouse")
        assert is_s3_path("s3a://bucket/warehouse")
        assert is_s3_path("S3://bucket/x")
        assert not is_s3_path("/local/warehouse")
        assert not is_s3_path("file:///local/warehouse")
        assert not is_s3_path("hdfs://nn/warehouse")

    def test_key_mapping_to_storage_options(self):
        s3 = S3Options.from_dict({
            "s3-access-key": "AK",
            "s3-secret-key": "SK",
            "s3-region": "us-west-2",
            "s3-endpoint": "http://localhost:9000",
            "s3-virtual-hosted-style": "false",
            "s3-allow-http": "true",
        })
        assert s3 is not None
        opts = s3.to_storage_options()
        assert opts == {
            "aws_access_key_id": "AK",
            "aws_secret_access_key": "SK",
            "aws_region": "us-west-2",
            "aws_endpoint": "http://localhost:9000",
            "virtual_hosted_style_request": "false",
            "allow_http": "true",
        }

    def test_defaults_match_reference(self):
        # ref LanceCatalogFactory.java: virtual-hosted-style=true, allow-http=false
        s3 = S3Options()
        opts = s3.to_storage_options()
        assert opts["virtual_hosted_style_request"] == "true"
        assert opts["allow_http"] == "false"

    def test_no_s3_keys_means_none(self):
        assert S3Options.from_dict({"path": "/x"}) is None

    def test_dataset_options_collects_s3(self):
        o = DatasetOptions.from_dict({
            "path": "s3://b/t",
            "s3-access-key": "AK",
            "s3-region": "eu-central-1",
        })
        assert o.s3 is not None and o.s3.access_key == "AK"
        assert o.s3.region == "eu-central-1"
        assert "s3-access-key" not in o.extra  # consumed, not leaked

    def test_s3_catalog_carries_options_and_refuses_local_io(self, monkeypatch):
        import sys

        # pin the fsspec-ABSENT degradation (tests/test_s3_read.py covers
        # the fsspec-present read path); a None sys.modules entry makes
        # `import fsspec` raise ImportError regardless of sys.path state
        monkeypatch.setitem(sys.modules, "fsspec", None)
        cat = DatasetCatalog("s3://bucket/wh", s3=S3Options(access_key="AK"))
        assert cat.is_remote
        assert cat.storage_options["aws_access_key_id"] == "AK"
        with pytest.raises(Unsupported, match="fsspec"):
            cat.list_databases()  # read path needs fsspec when emulated
        with pytest.raises(Unsupported, match="S3 warehouse"):
            cat.create_database("db")  # mutations refused always
        # pure path math still works
        assert cat.table_location("db", "t") == "s3://bucket/wh/db/t"

    def test_local_catalog_unaffected(self, tmp_path):
        cat = DatasetCatalog(str(tmp_path / "wh"))
        assert not cat.is_remote and cat.storage_options == {}
        cat.create_database("db1")
        assert "db1" in cat.list_databases()


@pytest.mark.skipif(not os.path.isdir(REF_FIXTURES), reason="reference fixtures absent")
class TestReferenceFixtureLayout:
    """Read-only pinning of layout compatibility against the reference's
    checked-in Lance datasets (test-data/lance-db1..3, lance-vector-search):
    same _versions/-based table detection, same version numbering."""

    FIXTURES = ["lance-db1", "lance-db2", "lance-db3", "lance-vector-search"]

    @pytest.mark.parametrize("name", FIXTURES)
    def test_is_dataset_detects_real_lance_layout(self, name):
        path = os.path.join(REF_FIXTURES, name)
        assert FR.is_dataset(path)  # detection by _versions/ (ref LanceCatalog.java:492-493)

    @pytest.mark.parametrize("name", FIXTURES)
    def test_latest_version_reads_native_manifest_names(self, name):
        path = os.path.join(REF_FIXTURES, name)
        assert FR.latest_version(path) == 1  # fixtures ship _versions/1.manifest

    def test_native_manifest_read_degrades_clearly(self):
        path = os.path.join(REF_FIXTURES, "lance-db1")
        with pytest.raises(FR.LanceUnavailableError):
            FR.read_manifest(path)

    def test_emulated_layout_uses_same_markers(self, tmp_path):
        # our datasets must be recognized by the same convention
        root = str(tmp_path / "ds")
        FR.commit(root, [], mode="overwrite")
        assert FR.is_dataset(root)
        assert os.path.isdir(os.path.join(root, FR.VERSIONS_DIR))
        assert FR.VERSIONS_DIR == "_versions" and FR.DATA_DIR == "data"


class TestEpochInManifest:
    def test_epoch_committed_from_manifest_chain_without_marker(self, spark, tmp_path):
        from flink_connector_lance_spark.streaming.sink import (
            EPOCH_META_KEY,
            commit_epoch,
            epoch_committed,
        )

        path = str(tmp_path / "ds")
        df = spark.range(10).selectExpr("id", "id * 2 AS v")
        m = commit_epoch(df, 7, path)
        assert m is not None and m.meta[EPOCH_META_KEY] == 7
        # simulate the crash window: marker lost, manifest survived
        os.remove(os.path.join(path, "_epochs", "7.json"))
        assert epoch_committed(path, 7)  # authoritative: manifest chain
        assert commit_epoch(df, 7, path) is None  # redelivery is a no-op
        assert FR.read_manifest(path).row_count == 10
        # a genuinely new epoch still commits
        assert commit_epoch(df, 8, path) is not None
        assert FR.read_manifest(path).row_count == 20
