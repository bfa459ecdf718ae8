"""Driver-tail vs driver-tail bench calibration (VERDICT r9 item 2).

The canonical round-over-round bench read compares the per-query
timings the DRIVER recorded in two BENCH_r{N}.json files — never a
solo run against a driver tail (solo sessions can differ from the
driver's loaded conditions by 2-3x on this shared host; see the
round-10 README bench notes for the measured inter-session swing).

Usage: python tools/bench_compare.py BENCH_r09.json BENCH_r10.json

Prints the shared-query subtotal of both tails, the drift percentage,
and the largest movers each way. A drift of +/-10% is the established
noise band; +15% or more for two consecutive rounds is a trend that
must be bisected by query family, not attributed to noise.
"""

from __future__ import annotations

import json
import re
import sys

#: non-query keys that the truncated tail fragment can leak into a
#: naive '"name": float' scan (they live in the parsed detail line)
_META_KEYS = {"sf", "reps", "value", "n", "rc", "cpus", "queries_total"}


def tail_queries(path: str) -> dict[str, float]:
    """Per-query seconds from a BENCH_r{N}.json driver record.

    Prefers the fully-parsed detail line when the driver kept it;
    falls back to scanning the truncated ``tail`` fragment (the
    driver's 2000-char window), which still holds 38+ queries.
    """
    text = open(path).read()
    if not text.strip():
        # a crashed bench run leaves a 0-byte capture — surface that
        # instead of a raw JSON/IndexError traceback
        raise SystemExit(f"{path} is empty (did the bench run fail?)")
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        # a solo `python bench.py` capture holds the full-detail JSON
        # on line 1 and a driver-style top-15 line after it — fall
        # back to the first line so solo captures work too
        d = json.loads(text.splitlines()[0])
    parsed = d.get("parsed") or {}
    if isinstance(parsed, dict) and parsed.get("queries"):
        out = dict(parsed["queries"])
    elif isinstance(d.get("queries"), dict):
        # solo bench.py detail line: queries sit at the top level
        out = dict(d["queries"])
    else:
        out = {}
    tail = d.get("tail", "")
    # Value pattern covers scientific notation (a 5e-05s timing must
    # not be silently skipped); each match must sit at a key boundary
    # — preceded (ignoring whitespace/backslash escapes) by '{' or
    # ',' — so a name cut at the arbitrary 2000-char window start
    # (e.g. the documented 'lineitem' artifact) can never contaminate
    # the shared-query subtotal (ADVICE r10).
    for m in re.finditer(
        r'\\?"([a-z0-9_]+)\\?": ([0-9.]+(?:[eE][-+]?[0-9]+)?)', tail
    ):
        before = tail[: m.start()].rstrip("\\ \t\n")
        if before and before[-1] not in "{,":
            continue
        if not before:  # window start: the key may itself be truncated
            continue
        out.setdefault(m.group(1), float(m.group(2)))
    return {k: v for k, v in out.items() if k not in _META_KEYS}


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(
            "usage: python tools/bench_compare.py "
            "BENCH_r{OLD}.json BENCH_r{NEW}.json"
        )
    old_path, new_path = sys.argv[1], sys.argv[2]
    old, new = tail_queries(old_path), tail_queries(new_path)
    shared = sorted(set(old) & set(new))
    if not shared:
        raise SystemExit("no shared queries between the two tails")
    s_old = sum(old[k] for k in shared)
    s_new = sum(new[k] for k in shared)
    drift = 100.0 * (s_new / s_old - 1.0)
    print(
        f"shared={len(shared)} subtotal {old_path}={s_old:.2f}s "
        f"{new_path}={s_new:.2f}s drift={drift:+.1f}%"
    )
    movers = sorted(shared, key=lambda k: new[k] / max(old[k], 1e-9))
    for k in movers[-5:][::-1]:
        print(f"  up   {k}: {old[k]:.2f} -> {new[k]:.2f} ({new[k]/old[k]:.2f}x)")
    for k in movers[:3]:
        print(f"  down {k}: {old[k]:.2f} -> {new[k]:.2f} ({new[k]/old[k]:.2f}x)")


if __name__ == "__main__":
    main()
