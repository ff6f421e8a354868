"""Dump `.explain("formatted")` for every queries() key to a directory.

Usage: python tools/dump_plans.py <out_dir> [sf_dir] [key ...]

Writes <out_dir>/<key>_<suffix>.txt (suffix from $PLAN_SUFFIX, default
none) — the before/after plan evidence the optimization rounds commit
under plans/rNN/.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3:])
    suffix = os.environ.get("PLAN_SUFFIX", "")
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry
    from yuki_spark.session import get_spark

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    fmt = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )

    for name, fn in sorted(entry.queries().items()):
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(fmt)
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(name, flush=True)


if __name__ == "__main__":
    main()
