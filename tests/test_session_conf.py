"""Contract tests for the session conf block (no JVM needed):
the s3a credential path is the reference's core load deliverable
(reference etl/load.py:43-84), expressed as public spark.hadoop.* keys
instead of the reference's py4j private-API duration shim."""

from __future__ import annotations

from etl_onprem_to_cloud_spark.session import build_conf


def test_s3a_block_uses_public_hadoop_confs():
    conf = build_conf(
        s3a={
            "access_key": "AK",
            "secret_key": "SK",
            "endpoint": "http://localhost:9000",
        }
    )
    assert conf["spark.hadoop.fs.s3a.access.key"] == "AK"
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "SK"
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://localhost:9000"
    assert (
        conf["spark.hadoop.fs.s3a.aws.credentials.provider"]
        == "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider"
    )
    # no private-API keys; everything is a plain spark.* conf string
    assert all(k.startswith("spark.") for k in conf)
    assert all(isinstance(v, str) for v in conf.values())


def test_s3a_endpoint_optional():
    conf = build_conf(s3a={"access_key": "AK", "secret_key": "SK"})
    assert "spark.hadoop.fs.s3a.endpoint" not in conf


def test_no_s3a_leaves_no_hadoop_keys():
    conf = build_conf()
    assert not [k for k in conf if k.startswith("spark.hadoop.fs.s3a")]


def test_core_scale_confs_present():
    conf = build_conf(shuffle_partitions=64)
    assert conf["spark.sql.adaptive.enabled"] == "true"
    assert conf["spark.sql.adaptive.skewJoin.enabled"] == "true"
    assert conf["spark.sql.shuffle.partitions"] == "64"
    assert conf["spark.sql.session.timeZone"] == "UTC"


def test_extra_conf_wins():
    conf = build_conf(extra_conf={"spark.sql.shuffle.partitions": "7"})
    assert conf["spark.sql.shuffle.partitions"] == "7"
