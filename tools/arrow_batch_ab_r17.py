"""r17 Arrow batch-size evaluation on the Python codec paths (guide
§4.3; VERDICT item 5).

Times multimodal_png_decode_stats / multimodal_jpeg_decode_stats /
multimodal_resize_stats under different
spark.sql.execution.arrow.maxRecordsPerBatch values, one fresh JVM per
(setting, repeat) so codegen/Arrow-runner warmup is identical per side.
The decode projections are ~192 bytes/row, so the default 10k-row batch
is ~2 MB; the sweep checks whether smaller (more pipelining) or larger
(less per-batch overhead) batches move the needle.

Usage:
    python tools/arrow_batch_ab_r17.py [--n 3] [--out evidence/...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_QUERIES = (
    "multimodal_png_decode_stats",
    "multimodal_jpeg_decode_stats",
    "multimodal_resize_stats",
)

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
import data_engineering_spotify_etl_airflow_aws_spark as engine
from data_engineering_spotify_etl_airflow_aws_spark import registry
from data_engineering_spotify_etl_airflow_aws_spark.session import get_spark
engine.load_all_operators()
sf_dir = sys.argv[2]
names = json.loads(sys.argv[3])
batch = sys.argv[4]
spark = get_spark(app_name="arrow-batch-ab")
if batch != "default":
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", batch)
warm = "/root/testdata/sf0.001"
for n in names:
    try:
        registry.QUERIES[n](spark, warm).collect()
    except Exception:
        pass
spark.catalog.clearCache()
out = {}
for n in names:
    t0 = time.perf_counter()
    registry.QUERIES[n](spark, sf_dir).collect()
    out[n] = round(time.perf_counter() - t0, 4)
    spark.catalog.clearCache()
print("###AB###" + json.dumps(out))
"""


def run(root: str, sf_dir: str, batch: str) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", _CHILD, root, sf_dir, json.dumps(list(_QUERIES)), batch],
        capture_output=True,
        text=True,
    )
    for line in p.stdout.splitlines():
        if line.startswith("###AB###"):
            return json.loads(line[len("###AB###"):])
    raise RuntimeError(p.stderr[-2000:])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="evidence/arrow_batch_ab_r17.json")
    args = ap.parse_args()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    settings = ("default", "1000", "100000")
    samples: dict[str, dict[str, list[float]]] = {
        q: {s: [] for s in settings} for q in _QUERIES
    }
    for _ in range(args.n):
        for s in settings:  # interleaved
            t = run(root, args.sf_dir, s)
            for q in _QUERIES:
                samples[q][s].append(t[q])
    mins = {
        q: {s: min(v) for s, v in per.items()} for q, per in samples.items()
    }
    out = {"settings": settings, "n": args.n, "min_of_n": mins, "samples": samples}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    tmp = args.out + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    os.replace(tmp, args.out)
    print(json.dumps(mins, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
