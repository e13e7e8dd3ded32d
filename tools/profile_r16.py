"""r16 optimization profiler: time named queries in isolation and dump
their formatted plans.

For each query name given on the command line (or --top N from a bench
JSON), runs the query k times (collect() like the bench, plus an
optional noop-sink pass that eagerly computes every column without the
driver transfer), records min-of-k wall seconds, and writes
``plans/r16/<query>_<tag>.txt`` with the .explain("formatted") output.

Usage:
    python tools/profile_r16.py --tag before --n 3 pagerank_trade_graph ...
    python tools/profile_r16.py --tag before --n 2 --top 20 \
        --bench evidence/bench_r16_baseline_sf0.1.json

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import data_engineering_spotify_etl_airflow_aws_spark as engine
from data_engineering_spotify_etl_airflow_aws_spark import registry
from data_engineering_spotify_etl_airflow_aws_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--noop", action="store_true", help="also time a noop-sink pass")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--bench", default="")
    ap.add_argument("--plans-dir", default="plans/r16")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    names = list(args.names)
    if args.top and args.bench:
        bench = json.load(open(args.bench))
        ranked = sorted(bench["queries"].items(), key=lambda kv: -kv[1])
        names += [k for k, _ in ranked[: args.top] if k not in names]
    if not names:
        print("no queries given", file=sys.stderr)
        return 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    engine.load_all_operators()
    unknown = [n for n in names if n not in registry.QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 1

    spark = get_spark(app_name="profile_r16", sf_dir=sf_dir)
    os.makedirs(args.plans_dir, exist_ok=True)

    # warm shared infrastructure so the first measured query does not pay
    # session/codegen spin-up (mirrors bench.py's warmup intent, smaller set)
    warm_dir = "/root/testdata/sf0.001"
    for wq in ("count_star", "multimodal_digest_features"):
        try:
            registry.QUERIES[wq](spark, warm_dir).collect()
        except Exception:
            pass
    spark.catalog.clearCache()

    results: dict[str, dict] = {}
    for name in names:
        fn = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(f"r16-profile:{name}")
        # plan snapshot (pre-execution; AQE initial plan)
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
        except Exception as exc:
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            spark.catalog.clearCache()
            continue
        spark.catalog.clearCache()
        rec: dict = {"collect": [], "noop": []}
        for _ in range(args.n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            rec["collect"].append(round(time.perf_counter() - t0, 4))
            spark.catalog.clearCache()
        if args.noop:
            for _ in range(args.n):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                rec["noop"].append(round(time.perf_counter() - t0, 4))
                spark.catalog.clearCache()
        rec["collect_min"] = min(rec["collect"])
        if rec["noop"]:
            rec["noop_min"] = min(rec["noop"])
        results[name] = rec
        print(
            f"{name}: collect min {rec['collect_min']:.3f} "
            + (f"noop min {rec['noop_min']:.3f}" if rec["noop"] else ""),
            file=sys.stderr,
        )
        spark.sparkContext.setJobDescription(None)

    out = json.dumps(results, indent=1)
    if args.out:
        tmp = args.out + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(out + "\n")
        os.replace(tmp, args.out)
    print(out)
    from data_engineering_spotify_etl_airflow_aws_spark import caches

    caches.release_all()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
