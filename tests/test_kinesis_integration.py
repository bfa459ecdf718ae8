"""Live Kinesis sink integration — env-gated.

Runs ONLY when both are true (neither holds in the test container):
  - boto3 is importable;
  - ``KADS_KINESIS_STREAM`` names an existing stream (and the ambient
    AWS credentials/region allow PutRecords to it).

Everything else about the writer (batching, partition keys, partial-
failure retry/backoff) is covered hermetically with an injected fake
client in tests/test_streaming.py — this test only proves the real
boto3 wiring end-to-end when an engineer opts in:

    KADS_KINESIS_STREAM=my-stream AWS_DEFAULT_REGION=us-east-1 \
        python -m pytest tests/test_kinesis_integration.py -q
"""

from __future__ import annotations

import os

import pytest

try:  # gated: boto3 is absent in the test container
    import boto3  # noqa: F401

    _HAVE_BOTO3 = True
except Exception:
    _HAVE_BOTO3 = False

STREAM = os.environ.get("KADS_KINESIS_STREAM", "")

pytestmark = pytest.mark.skipif(
    not (_HAVE_BOTO3 and STREAM),
    reason="live Kinesis test needs boto3 + KADS_KINESIS_STREAM",
)


def test_kinesis_put_roundtrip(spark):
    from kinesis_analytics_demo_spark.sinks.factory import KinesisBatchWriter
    from kinesis_analytics_demo_spark.session import read_table
    from tests.conftest import SF_MEDIUM

    region = os.environ.get("AWS_DEFAULT_REGION", "us-east-1")
    writer = KinesisBatchWriter(
        stream_name=STREAM, region=region, partition_key_col="event_type"
    )
    batch = (
        read_table(spark, SF_MEDIUM, "events")
        .select("event_id", "event_type", "value")
        .limit(25)
    )
    writer(batch, batch_id=0)  # raises on non-retryable failure

    client = boto3.client("kinesis", region_name=region)
    desc = client.describe_stream_summary(StreamName=STREAM)
    assert desc["StreamDescriptionSummary"]["StreamStatus"] == "ACTIVE"
