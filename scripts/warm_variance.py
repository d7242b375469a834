"""Warm-protocol variance probe (r4 verdict #8): run one registry
query's warm-cache timed wall K times in a single session and report
min/median/max — the tool for classifying a cross-round wall delta as
plan regression vs VM noise. BENCH.md's r2-r4 walls are single
warm-timed runs; this prints the distribution those samples come from.

Usage: python scripts/warm_variance.py [query ...] [--reps 5] [--sf-dir D]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=["simhash_prod_pairs"])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()
    names = args.queries or ["simhash_prod_pairs"]

    import __spark_entry__ as entry
    from webextract import cache, pipeline

    spark = pipeline.build_session(cpus=args.cpus, app="warm-variance",
                                   shuffle_partitions=max(args.cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    out = {}
    qs = entry.queries()
    for name in names:
        fn = qs[name]
        walls = []
        for _ in range(args.reps):
            # the exact BENCH protocol: warm run populates persisted
            # subtrees, timed run measures post-cache stages, caches
            # released AFTER the timed run
            fn(spark, args.sf_dir).write.format("noop") \
                .mode("overwrite").save()
            t0 = time.monotonic()
            fn(spark, args.sf_dir).write.format("noop") \
                .mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 3))
            cache.release_all()
        out[name] = {"walls": walls, "min": min(walls),
                     "median": round(statistics.median(walls), 3),
                     "max": max(walls),
                     "spread": round(max(walls) / min(walls), 2)}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
