"""Smoke test for the example CLIs — they must run end-to-end from a
plain shell (no pytest fixtures, their own SparkSession) because they
are the repo's documented user surface."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_corpus_prep_example_cli(tmp_path):
    out_dir = str(tmp_path / "corpus_out")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "examples", "corpus_prep.py"),
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--out",
            out_dir,
            "--decontaminate",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),  # NOT the repo root: worker pickling must hold
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["out"] == out_dir
    counts = summary["kept_by_split"]
    assert counts.get("train", 0) > 0
    assert sum(counts.values()) <= 1000  # never more docs than the corpus
    # split-partitioned parquet layout on disk
    subdirs = {d for d in os.listdir(out_dir) if d.startswith("split=")}
    assert "split=train" in subdirs


def test_connector_pipeline_example_cli(tmp_path):
    import json
    import os
    import subprocess
    import sys

    out = str(tmp_path / "candles")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "examples", "connector_pipeline.py"),
            "--out", out,
            "--rows-per-batch", "80",
            "--batches", "2",
            "--timeout-s", "90",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "batches=" in proc.stdout
    manifests = [f for f in os.listdir(out) if f.startswith("_manifest-")]
    assert manifests, proc.stdout
    with open(os.path.join(out, sorted(manifests)[-1])) as fh:
        m = json.load(fh)
    assert m["total_rows"] > 0


def test_cumulate_example_cli(tmp_path):
    import subprocess
    import sys

    ticks = str(tmp_path / "ticks")
    gen = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "datagen", "stock.py"),
            "--target", "dir",
            "--out-dir", ticks,
            "--base-time", "2024-06-01T00:00:00",
            "--step-s", "600",
            "--n-files", "2",
            "--seed", "7",
        ],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert gen.returncode == 0, gen.stderr[-500:]
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "examples", "cumulate_window.py"),
            "--path", ticks,
            "--max-size", "1 day",
            "--step", "6 hours",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-1000:]
    assert "window_start" in proc.stdout and "window_end" in proc.stdout


def test_curation_report_example_cli(tmp_path):
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "examples", "curation_report.py"),
            "--sf-dir",
            "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),  # NOT the repo root: worker pickling must hold
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert set(report) >= {
        "privacy", "target_fit", "label_noise", "tokenizer", "layout",
    }
    assert len(report["tokenizer"]["first_bpe_merges"]) == 5
    assert report["layout"]["n_output_shards"] > 0
    assert "en" in report["target_fit"]
    assert len(report["privacy"]["dp_event_counts_eps1"]) == 5
