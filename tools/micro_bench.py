"""Micro-bench a subset of queries() keys with the bench methodology
(noop sink, min of N) against the DEFAULT artifact stores (steady
state — run once to warm deposits, then compare mins across code
versions on one host).

Usage: python tools/micro_bench.py key [key ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), MB_RUNS (3).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("MB_RUNS", "3"))
    names = sys.argv[1:]

    import __spark_entry__ as entry
    from yuki_spark.session import get_spark

    qs = entry.queries()
    spark = get_spark("micro_bench")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> None:
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()

    # warm-up: one pass of each key (builds any cold deposits, warms
    # the Arrow worker pool + codegen)
    for n in names:
        t0 = time.perf_counter()
        run(n)
        print(f"warm {n}: {time.perf_counter() - t0:.2f}s", flush=True)

    out: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs):
        for n in names:
            t0 = time.perf_counter()
            run(n)
            out[n].append(round(time.perf_counter() - t0, 3))
    res = {n: {"min": min(v), "all": v} for n, v in out.items()}
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
