"""Config loader tests: property-group format fidelity (the reference's
application_properties.json shape) and duration canonicalization."""

from __future__ import annotations

import json

import pytest

from kinesis_analytics_demo_spark.config import (
    AppConfig,
    canonical_duration,
    get_application_properties,
    property_map,
)

REFERENCE_SHAPE = [
    {
        "PropertyGroupId": "consumer.config.0",
        "PropertyMap": {
            "input.stream.name": "InStream",
            "flink.stream.initpos": "LATEST",
            "aws.region": "us-east-1",
            "flink.sliding_window.over": "8.hours",
            "flink.sliding_window.every": "1.minutes",
            "flink.sliding_window.on": "utc",
            "flink.sliding_window.alias": "eight_hour_window",
            "json.timestamp_format_standard": "SQL",
        },
    },
    {
        "PropertyGroupId": "producer.config.0",
        "PropertyMap": {"output.stream.name": "OutStream", "shard.count": "1"},
    },
]


def test_property_map_selection():
    assert property_map(REFERENCE_SHAPE, "producer.config.0")["output.stream.name"] == "OutStream"
    assert property_map(REFERENCE_SHAPE, "missing") == {}


def test_is_local_switch(tmp_path, monkeypatch):
    p = tmp_path / "application_properties.json"
    p.write_text(json.dumps(REFERENCE_SHAPE))
    monkeypatch.setenv("IS_LOCAL", "true")
    props = get_application_properties(local_path=str(p))
    assert property_map(props, "consumer.config.0")["input.stream.name"] == "InStream"


@pytest.mark.parametrize(
    "raw,expect",
    [
        ("8.hours", "8 hours"),       # Flink Table API form (config file)
        ("1.minutes", "1 minute"),
        ("'1' MINUTE", "1 minute"),   # Flink SQL form (README run log)
        ("2 minutes", "2 minutes"),   # Spark form
        ("20 seconds", "20 seconds"),
    ],
)
def test_canonical_duration(raw, expect):
    assert canonical_duration(raw) == expect


def test_canonical_duration_rejects_garbage():
    with pytest.raises(ValueError):
        canonical_duration("soon")


def test_app_config_defaults_and_reference_values():
    cfg = AppConfig(REFERENCE_SHAPE)
    assert cfg.input_stream == "InStream"
    assert cfg.output_stream == "OutStream"
    assert cfg.window_over == "8 hours"
    assert cfg.window_every == "1 minute"
    assert cfg.window_on == "utc"
    assert cfg.window_alias == "eight_hour_window"
    assert cfg.timestamp_format == "SQL"
    assert cfg.sink_batch_size == 100


# ---- env_coef: defensive parse of the adaptive-nprobe dials
# (ADVICE r10: a malformed env var must not take down registry import)

def test_env_coef_unset_returns_default(monkeypatch):
    from kinesis_analytics_demo_spark.config import env_coef

    monkeypatch.delenv("X_COEF", raising=False)
    assert env_coef("X_COEF", 0.86, 0.69, 1.38) == 0.86


def test_env_coef_malformed_falls_back_with_warning(monkeypatch):
    from kinesis_analytics_demo_spark.config import env_coef

    monkeypatch.setenv("X_COEF", "fast")
    with pytest.warns(UserWarning, match="not a number"):
        assert env_coef("X_COEF", 0.86, 0.69, 1.38) == 0.86


@pytest.mark.parametrize("raw", ["nan", "inf", "-inf"])
def test_env_coef_non_finite_falls_back_with_warning(monkeypatch, raw):
    from kinesis_analytics_demo_spark.config import env_coef

    monkeypatch.setenv("X_COEF", raw)
    with pytest.warns(UserWarning, match="not finite"):
        assert env_coef("X_COEF", 0.6, 5e-324, 0.61) == 0.6


def test_env_coef_out_of_range_warns_but_honors(monkeypatch):
    # out-of-range is a legitimate production operating point — the
    # oracle embeds the same value at import so both engines agree;
    # the warning flags that test-SF bit-stability no longer holds
    from kinesis_analytics_demo_spark.config import env_coef

    monkeypatch.setenv("X_COEF", "2.0")
    with pytest.warns(UserWarning, match="bit-stable range"):
        assert env_coef("X_COEF", 0.86, 0.69, 1.38) == 2.0


def test_env_coef_in_range_is_silent(monkeypatch, recwarn):
    from kinesis_analytics_demo_spark.config import env_coef

    monkeypatch.setenv("X_COEF", "1.2")
    assert env_coef("X_COEF", 0.86, 0.69, 1.38) == 1.2
    assert not recwarn.list
