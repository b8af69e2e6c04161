"""Cold/warm gap check for the trainer entries (VERDICT r14 task 1's
done-criterion): each entry whose declared computation includes model
training must cost the SAME in a cold single run as in the bench's
min-of-runs — i.e. no per-generation memo is absorbing the training
cost into run 1 and letting the min exclude it.

For each entry this tool spawns a FRESH python process (so every
in-process dict memo starts empty), times ONE noop-sinked run there,
and prints it next to the same-process min-of-3. A trainer memo would
show cold >> min; unconditional in-entry training shows cold ~= min
(both pay the Lloyd loops).

    python tools/train_cold_check.py            # prints one JSON line
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ENTRIES = [
    "embed_kmeans",
    "embed_topk_pq",
    "embed_recall_eval",
    "embed_pq_distortion",
    "stream_pq_distortion",
    "semantic_dedup",
    "cluster_balanced_sample",
    "cluster_quality_matrix",
    "embed_ivfpq_topk",
    # CONTROLS — entries with no model training and no memo anywhere:
    # their cold/min3 gap is the GENERIC fresh-session effect (JIT,
    # codegen cache, parquet footer cache, shuffle machinery).  A
    # trainer entry whose gap matches the controls' carries no hidden
    # memo; only a gap well ABOVE the control band would mean training
    # escaped the timed region.
    "dedup_simhash",
    "embed_topk",
    "bm25_rank",
    "stream_token_spectrum",
]

_CHILD = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
from fluxdb_spark import get_spark
from fluxdb_spark.catalog import catalog
spark = get_spark(app_name="train_cold_check")
sf = {sf!r}
spec = {{s.name: s for s in catalog()}}[{name!r}]
# session warm-up the way bench.py does it: an unrelated tiny read so
# the JVM/scan machinery is hot but nothing entry-specific is
spark.read.parquet(f"{{sf}}/documents.parquet").count()
t0 = time.time()
spec.spark(spark, sf).write.format("noop").mode("overwrite").save()
cold = time.time() - t0
runs = []
for _ in range(3):
    spark.catalog.clearCache()
    t0 = time.time()
    spec.spark(spark, sf).write.format("noop").mode("overwrite").save()
    runs.append(time.time() - t0)
print(json.dumps({{"cold": round(cold, 3), "min3": round(min(runs), 3)}}))
spark.stop()
"""


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = {}
    for name in ENTRIES:
        code = _CHILD.format(repo=repo, sf=sf, name=name)
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True
        )
        line = [
            ln for ln in proc.stdout.splitlines() if ln.startswith("{")
        ]
        if not line:
            out[name] = {"error": proc.stderr[-300:]}
        else:
            out[name] = json.loads(line[-1])
            out[name]["gap_x"] = (
                round(out[name]["cold"] / out[name]["min3"], 2)
                if out[name]["min3"]
                else None
            )
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"metric": "train_cold_check", "queries": out}))


if __name__ == "__main__":
    main()
