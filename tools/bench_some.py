"""Time a subset of catalog entries with the exact bench.py methodology
(sf0.001 plan warm-up, min of 2-3 runs, clearCache between runs).

Usage: python tools/bench_some.py q1 q2 ... [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluxdb_spark import get_spark  # noqa: E402
from fluxdb_spark.catalog import catalog  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    warm_dir = "/root/testdata/sf0.001"
    spark = get_spark(app_name="bench_some")
    specs = {s.name: s for s in catalog()}
    specs["flux_checkpoint"].spark(spark, sf_dir).collect()
    for name in args:
        try:
            specs[name].spark(spark, warm_dir).count()
        except Exception as e:
            print(f"# warmup {name} failed: {e}", file=sys.stderr)
    for name in args:
        fn = specs[name].spark
        best, n = float("inf"), 0
        for run in range(3):
            if run == 2 and best < 2.0:
                break
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            best = min(best, time.time() - t0)
            del df
            gc.collect()
        print(f"{name}: {round(best, 3)}s ({n} rows)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
