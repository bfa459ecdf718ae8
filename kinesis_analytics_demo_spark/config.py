"""Property-group configuration loader.

Keeps the reference's runtime-configuration shape
(flink/application_properties.json.replace: a JSON list of
``{"PropertyGroupId": ..., "PropertyMap": {...}}`` groups) and its
``IS_LOCAL`` environment switch (reference
flink/tumbling_window.py:47,62-94), so a user of the reference can
bring their properties file unchanged.

Canonicalization fixes the reference's interval-syntax mismatch
(SURVEY.md §2 quirks): the checked-in config carries Table-API-style
durations (``8.hours``, ``1.minutes``) while the SQL job needs
SQL-style (``'1' MINUTE``). This engine accepts BOTH plus Spark's
native form (``"8 hours"``) and normalizes to the Spark string.
"""

from __future__ import annotations

import json
import os
import re

#: Default on-host path used by the managed runtime in the reference
#: (flink/tumbling_window.py:47).
DEFAULT_PROPERTIES_PATH = "/etc/flink/application_properties.json"

_UNIT_ALIASES = {
    "second": "second",
    "seconds": "second",
    "minute": "minute",
    "minutes": "minute",
    "hour": "hour",
    "hours": "hour",
    "day": "day",
    "days": "day",
    "millisecond": "millisecond",
    "milliseconds": "millisecond",
}


def get_application_properties(
    path: str | None = None,
    local_path: str | None = None,
) -> list[dict]:
    """Load the property-group list. When ``IS_LOCAL`` is set (the
    reference's local-development switch), read ``local_path`` (or
    ``./application_properties.json``) instead of the managed-runtime
    path."""
    if os.environ.get("IS_LOCAL"):
        path = local_path or path or "application_properties.json"
    else:
        path = path or DEFAULT_PROPERTIES_PATH
    with open(path) as fh:
        return json.load(fh)


def property_map(props: list[dict], property_group_id: str) -> dict[str, str]:
    """Select one group's PropertyMap by id (reference
    flink/tumbling_window.py:89-94)."""
    for group in props:
        if group.get("PropertyGroupId") == property_group_id:
            return dict(group.get("PropertyMap", {}))
    return {}


def canonical_duration(value: str) -> str:
    """Normalize a window duration to Spark's ``window()`` string form.

    Accepts:
    - Spark form: ``"8 hours"``, ``"1 minute"``
    - Flink Table-API form: ``"8.hours"``, ``"1.minutes"``
      (application_properties.json.replace:14-15)
    - Flink SQL INTERVAL fragments: ``"'1' MINUTE"``
      (reference README.md:195-196)
    """
    v = value.strip()
    m = re.fullmatch(r"(\d+)\.(\w+)", v)  # 8.hours
    if not m:
        m = re.fullmatch(r"'(\d+)'\s+(\w+)", v)  # '1' MINUTE
    if not m:
        m = re.fullmatch(r"(\d+)\s+(\w+)", v)  # 8 hours
    if not m:
        raise ValueError(f"unrecognized duration: {value!r}")
    n, unit = m.group(1), m.group(2).lower()
    if unit not in _UNIT_ALIASES:
        raise ValueError(f"unrecognized duration unit in {value!r}")
    base = _UNIT_ALIASES[unit]
    return f"{n} {base}" if n == "1" else f"{n} {base}s"


_UNIT_MILLIS = {
    "millisecond": 1,
    "second": 1000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
}


def duration_millis(value: str) -> int:
    """Duration in milliseconds, accepting every form
    ``canonical_duration`` does."""
    n, base = canonical_duration(value).split(" ", 1)
    return int(n) * _UNIT_MILLIS[base.rstrip("s")]


class AppConfig:
    """Typed view over the reference's property groups, with its
    defaults (reference flink/tumbling_window.py:201-223 and
    flink/sliding_window.py:186-209)."""

    def __init__(self, props: list[dict]):
        self.props = props
        self.consumer = property_map(props, "consumer.config.0")
        self.producer = property_map(props, "producer.config.0")

    @classmethod
    def load(cls, path: str | None = None) -> "AppConfig":
        return cls(get_application_properties(path))

    # --- source ---
    @property
    def input_stream(self) -> str:
        return self.consumer.get("input.stream.name", "input-stream")

    @property
    def region(self) -> str:
        return self.consumer.get("aws.region", "us-east-1")

    @property
    def stream_initpos(self) -> str:
        return self.consumer.get("flink.stream.initpos", "LATEST")

    @property
    def timestamp_format(self) -> str:
        # 'SQL' or 'ISO-8601' (reference flink/tumbling_window.py:104-113)
        return self.consumer.get("json.timestamp_format_standard", "ISO-8601")

    # --- sliding window (reference flink.sliding_window.* keys) ---
    @property
    def window_over(self) -> str:
        return canonical_duration(
            self.consumer.get("flink.sliding_window.over", "2.minutes")
        )

    @property
    def window_every(self) -> str:
        return canonical_duration(
            self.consumer.get("flink.sliding_window.every", "1.minutes")
        )

    @property
    def window_on(self) -> str:
        return self.consumer.get("flink.sliding_window.on", "utc")

    @property
    def window_alias(self) -> str:
        return self.consumer.get("flink.sliding_window.alias", "sliding_window")

    # --- sink ---
    @property
    def output_stream(self) -> str:
        return self.producer.get("output.stream.name", "output-stream")

    @property
    def sink_batch_size(self) -> int:
        # 'sink.producer.collection-max-count' analog (reference
        # flink/tumbling_window.py:128)
        return int(self.producer.get("sink.batch.size", "100"))


def env_coef(
    name: str,
    default: float,
    stable_lo: float,
    stable_hi: float,
) -> float:
    """Parse a tuning-coefficient environment variable defensively.

    The adaptive-nprobe dials (``SPARK_GRAFT_MNN_NP_COEF``,
    ``SPARK_GRAFT_KNN_NP_COEF``) are read at module import inside
    ``registry._load_all_modules``, so a bare ``float(...)`` on a
    malformed value would take down the ENTIRE query registry — not
    just the two bucketed twins (ADVICE r10). Policy:

    - unparsable or non-finite -> warn and fall back to ``default``
      (nan/inf would otherwise be interpolated into oracle SQL);
    - finite but outside the documented test-SF bit-stable range
      ``[stable_lo, stable_hi]`` -> warn and HONOR it: out-of-range
      is a legitimate operating point at production corpus sizes
      (the oracle embeds the same value at import so both engines
      still agree), it merely changes results vs the default at
      some scale — the warning makes that explicit.
    """
    import math
    import warnings

    raw = os.environ.get(name)
    if raw is None:
        return default
    try:
        val = float(raw)
    except ValueError:
        warnings.warn(
            f"{name}={raw!r} is not a number; using default {default}",
            stacklevel=2,
        )
        return default
    if not math.isfinite(val):
        warnings.warn(
            f"{name}={raw!r} is not finite; using default {default}",
            stacklevel=2,
        )
        return default
    if not (stable_lo <= val <= stable_hi):
        warnings.warn(
            f"{name}={val} is outside the documented test-SF "
            f"bit-stable range [{stable_lo}, {stable_hi}]; honoring "
            "it, but results may differ from the default at some "
            "corpus scales",
            stacklevel=2,
        )
    return val
