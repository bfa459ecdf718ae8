"""Compute the next driver-rotation recency slate.

Reads every CORRECTNESS_r*.json in the repo root, computes each
registered query's driver-row recency (the latest round in which the
driver recorded a row for it), and prints the N stalest queries in
REGISTRATION order (the rotation's tie-break within a cohort). Queries
whose implementing code changes during the round must be prepended by
hand — "changed code always leads the slate" is a judgment call the
tool cannot make.

Usage: python tools/recency_slate.py [N]   (default 50)

The output is exactly the list to paste into
``plans/registry._DRIVER_PRIORITY`` (minus the changed-code leads);
the per-cohort counts let the rotation comment cite its composition.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def recency_by_query(repo: str = REPO) -> dict[str, int]:
    """latest driver round per query name, from CORRECTNESS_r*.json."""
    rec: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        for name in json.load(open(path)):
            rec[name] = max(rec.get(name, 0), rnd)
    return rec


def registration_order() -> list[str]:
    """Canonical (fresh-process) registration order.

    ``_REGISTRY`` is a plain dict keyed by registration time, so its
    in-process order shifts if some operator module was already
    imported before ``_load_all_modules`` runs (e.g. by an earlier
    pytest test) — and transitive imports between operator modules
    mean the order cannot be reconstructed structurally from the
    import list either.  The only faithful source is a fresh
    interpreter, so compute it in a subprocess (~5s; registration
    does not start a JVM).
    """
    import subprocess

    code = (
        "import sys; sys.path.insert(0, {repo!r})\n"
        "from kinesis_analytics_demo_spark.plans import registry as R\n"
        "R._load_all_modules()\n"
        "print('\\n'.join(R._REGISTRY))\n"
    ).format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        check=True,
    )
    return out.stdout.split()


def stalest(n: int) -> list[tuple[str, int]]:
    """The n stalest (name, last_round) pairs: never-checked first (a
    registry unfreeze would surface here), then ascending recency,
    registration order within a cohort."""
    rec = recency_by_query()
    order = registration_order()
    ranked = sorted(
        ((name, rec.get(name, 0)) for name in order),
        key=lambda t: t[1],
    )
    # sorted() is stable, so registration order survives within cohorts
    return ranked[:n]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    rows = stalest(n)
    counts: dict[int, int] = {}
    for _, rnd in rows:
        counts[rnd] = counts.get(rnd, 0) + 1
    print(
        f"# {n}-slot slate; cohorts: "
        + ", ".join(f"r{r}-era x{c}" for r, c in sorted(counts.items()))
    )
    for name, rnd in rows:
        print(f'    "{name}",  # r{rnd}')


if __name__ == "__main__":
    main()
