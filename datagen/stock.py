"""Stock-tick data generator — functional port of the reference's
producer (datagen/stock.py: record schema at :24-33, put loop at
:36-50, CLI at :65-81), extended with local targets so the streaming
path is testable without AWS:

- ``--target dir``     write JSON-lines files into a directory (one
                       file per flush) — replayed by the engine's
                       ``file-json`` source as micro-batches;
- ``--target stdout``  print records (the reference prints each one);
- ``--target kinesis`` boto3 put_record loop, exactly the reference's
                       behavior (requires boto3 + AWS credentials).

Record schema preserved: 8 fields, of which the engine's declared
table consumes 3 (ticker/price/utc) — the extra fields exercise the
source-side implicit projection (SURVEY.md §2 P4).
"""

from __future__ import annotations

import argparse
import json
import os
import random
import time
from datetime import datetime, timedelta, timezone


def get_data(rng: random.Random, now: datetime | None = None) -> dict:
    """One tick, same shape as the reference producer
    (datagen/stock.py:24-33)."""
    ts = now or datetime.now(timezone.utc).replace(tzinfo=None)
    return {
        "utc": ts.isoformat(),
        "type": "get_live_price",
        "source": "xxx",
        "ticker": rng.choice(["AAPL", "AMZN", "MSFT", "TSLA"]),
        "name": "xxx common stock",
        "sector": "technology",
        "industry": "consumer electronics",
        "price": round(rng.random() * 100, 2),
    }


def generate_to_dir(
    out_dir: str,
    n_files: int = 10,
    records_per_file: int = 100,
    seed: int | None = None,
    interval_s: float = 0.0,
    base_time: datetime | None = None,
    step_s: float = 0.0,
    start_index: int = 0,
) -> list[str]:
    """Write n_files JSON-lines files (each a micro-batch for the
    file-json source). Deterministic when seeded; when ``base_time``
    is given, record event times advance by ``step_s`` per record
    (controlled event-time progression for watermark tests)."""
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(seed)
    paths = []
    t = base_time
    for i in range(start_index, start_index + n_files):
        path = os.path.join(out_dir, f"ticks-{i:05d}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            for _ in range(records_per_file):
                fh.write(json.dumps(get_data(rng, now=t)) + "\n")
                if t is not None:
                    t = t + timedelta(seconds=step_s)
        os.rename(tmp, path)  # atomic: the stream never sees partials
        paths.append(path)
        if interval_s:
            time.sleep(interval_s)
    return paths


def generate_to_stdout(rate_per_s: float = 10.0, seed: int | None = None) -> None:
    rng = random.Random(seed)
    while True:
        print(json.dumps(get_data(rng)), flush=True)
        time.sleep(1.0 / rate_per_s)


def generate_to_kinesis(
    stream_name: str, partition_key: str = "AAPL", region: str = "us-east-1"
) -> None:
    """The reference's unthrottled serial put_record loop
    (datagen/stock.py:36-50)."""
    import boto3

    client = boto3.client("kinesis", region_name=region)
    rng = random.Random()
    while True:
        data = get_data(rng)
        print(data)
        client.put_record(
            StreamName=stream_name,
            Data=json.dumps(data),
            PartitionKey=partition_key,
        )


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--target", choices=["dir", "stdout", "kinesis"], default="stdout")
    p.add_argument("--out-dir", default="/tmp/kads-ticks")
    p.add_argument("--stream-name", default="input-stream")
    p.add_argument("--partition-key", default="AAPL")
    p.add_argument("--region", default="us-east-1")
    p.add_argument("--n-files", type=int, default=10)
    p.add_argument("--records-per-file", type=int, default=100)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument(
        "--base-time",
        default=None,
        help="ISO timestamp for the first record's event time "
        "(default: wall clock). With --step-s, compresses hours of "
        "event time into one generated batch so windows close "
        "immediately on replay.",
    )
    p.add_argument(
        "--step-s",
        type=float,
        default=0.0,
        help="event-time seconds between consecutive records",
    )
    args = p.parse_args()
    if args.target == "dir":
        base = datetime.fromisoformat(args.base_time) if args.base_time else None
        if args.step_s and base is None:
            base = datetime.now(timezone.utc).replace(tzinfo=None)
        generate_to_dir(
            args.out_dir,
            args.n_files,
            args.records_per_file,
            args.seed,
            base_time=base,
            step_s=args.step_s,
        )
    elif args.target == "stdout":
        generate_to_stdout(seed=args.seed)
    else:
        generate_to_kinesis(args.stream_name, args.partition_key, args.region)


if __name__ == "__main__":
    main()
