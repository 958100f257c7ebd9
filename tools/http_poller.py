#!/usr/bin/env python3
"""Landing-zone poller for a live HTTP feed (README "Fronting a live HTTP
feed"). Ingest infrastructure, NOT the engine: it plays the role of the
reference's aiohttp poll loop (/root/reference/src/mining/utils/extract.py)
— GET each endpoint on a fixed cadence and write each response body
VERBATIM as one payload_<epoch_ms>.json file into the landing directory
that `BitcoinEtl.avgInfoStream(spark, landingDir)` consumes as a
micro-batch stream.

Offset contract (sources/PayloadJsonSource.scala): file names must be
monotonically increasing in sort order, and a file must appear atomically.
Both are satisfied here by (a) zero-padded epoch-ms names with a sequence
suffix for same-millisecond writes, (b) write-to-temp + os.rename within
the same filesystem.

The sandbox has no network egress, so this script is exercised only with
--fake (which writes the two reference payload shapes without any socket);
nothing in the test suite imports or runs it. With real egress:

    python3 tools/http_poller.py /data/landing \\
        --url https://mempool.space/api/v1/prices \\
        --url https://mempool.space/api/v1/mining/hashrate/3d \\
        --interval 30

Malformed / error responses are still written verbatim — the engine's
payload parser lands them as kind='error' rows (the reference's
swallow-and-log path), so the poller never has to understand payloads.
"""
import argparse
import json
import os
import sys
import time
import urllib.request


def monotonic_name(landing_dir: str, seq: int) -> str:
    # zero-padded epoch ms sorts correctly until year 2286; the seq suffix
    # keeps same-millisecond writes monotone too
    return f"payload_{int(time.time() * 1000):013d}_{seq:06d}.json"


def write_atomic(landing_dir: str, name: str, body: bytes) -> None:
    tmp = os.path.join(landing_dir, f".tmp_{name}")
    with open(tmp, "wb") as f:
        f.write(body)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, os.path.join(landing_dir, name))  # atomic publish


def fetch(url: str, timeout: float) -> bytes:
    req = urllib.request.Request(url, headers={"User-Agent": "graft-poller/1"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        body = resp.read()
    # wrap like the reference's extract.py: spider_ts + the payload under
    # a key derived from the endpoint (prices -> price_data, hashrate ->
    # hash_rate_data); unknown endpoints pass the body through verbatim
    ts = int(time.time())
    key = ("price_data" if "prices" in url
           else "hash_rate_data" if "hashrate" in url else None)
    if key is None:
        return body
    try:
        parsed = json.loads(body)
    except ValueError:
        return body  # malformed: land verbatim, engine tags kind='error'
    return json.dumps({"spider_ts": ts, key: parsed}).encode()


def fake_bodies(i: int) -> bytes:
    ts = int(time.time())
    if i % 2 == 0:
        return json.dumps({"spider_ts": ts,
                           "price_data": {"USD": 50000 + i % 997, "time": ts}}).encode()
    return json.dumps({"spider_ts": ts,
                       "hash_rate_data": {"currentHashrate": 1000 + i,
                                          "currentDifficulty": 500 + i}}).encode()


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("landing_dir")
    p.add_argument("--url", action="append", default=[],
                   help="endpoint to poll (repeatable)")
    p.add_argument("--interval", type=float, default=30.0,
                   help="poll cadence in seconds (reference: 30)")
    p.add_argument("--timeout", type=float, default=10.0)
    p.add_argument("--once", action="store_true", help="one poll round, then exit")
    p.add_argument("--fake", type=int, metavar="N", default=0,
                   help="write N fake payloads (no network) and exit")
    args = p.parse_args()

    os.makedirs(args.landing_dir, exist_ok=True)
    seq = 0

    if args.fake:
        for i in range(args.fake):
            write_atomic(args.landing_dir, monotonic_name(args.landing_dir, seq),
                         fake_bodies(i))
            seq += 1
        print(f"wrote {args.fake} fake payloads to {args.landing_dir}")
        return 0

    if not args.url:
        p.error("at least one --url is required (or use --fake N)")

    while True:
        for url in args.url:
            try:
                body = fetch(url, args.timeout)
            except Exception as e:  # network errors: log and keep polling
                print(f"poll error for {url}: {e}", file=sys.stderr)
                continue
            write_atomic(args.landing_dir, monotonic_name(args.landing_dir, seq), body)
            seq += 1
        if args.once:
            return 0
        time.sleep(args.interval)


if __name__ == "__main__":
    sys.exit(main())
