"""r17 streaming floor profile (VERDICT item 8, measure-only).

~25 s of suite wall is Structured Streaming machinery across the
stream_* family. This tool attaches a StreamingQueryListener, runs each
streaming-family query once (same collect() the bench times), and
records per-drain batch counts and where the per-batch time goes
(addBatch = real work, the rest is engine machinery: batch planning,
offset/commit WAL writes, state-store commits). The output decides
whether any plan-shape defect exists or the cost is the engine floor
the queries deliberately exercise.

Usage:
    python tools/stream_profile_r17.py [--out evidence/stream_profile_r17.json]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import data_engineering_spotify_etl_airflow_aws_spark as engine
from data_engineering_spotify_etl_airflow_aws_spark import registry
from data_engineering_spotify_etl_airflow_aws_spark.session import get_spark

_STREAM_QUERIES = (
    "streaming_ingest_songs",
    "stream_rest_api_songs",
    "stream_dedup_events",
    "stream_static_enrich",
    "stream_multimodal_decode",
    "stream_foreachbatch_upsert",
    "stream_rate_limit_flags",
    "stream_session_rollup",
    "stream_join_click_purchase",
    "stream_left_join_click_purchase",
    "stream_full_join_click_purchase",
    "stateful_running_totals",
)


def main() -> int:
    from pyspark.sql.streaming import StreamingQueryListener

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="evidence/stream_profile_r17.json")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    engine.load_all_operators()
    spark = get_spark(app_name="stream-profile-r17", sf_dir=sf_dir)

    progresses: list[dict] = []

    class Collector(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            try:
                progresses.append(json.loads(event.progress.json))
            except Exception:
                pass

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(Collector())

    # warm the streaming machinery once so the first profiled drain does
    # not absorb engine spin-up (mirrors bench.py's warmup intent)
    warm = "/root/testdata/sf0.001"
    for wq in ("streaming_ingest_songs", "stream_dedup_events"):
        try:
            registry.QUERIES[wq](spark, warm).collect()
        except Exception:
            pass
    spark.catalog.clearCache()
    progresses.clear()

    results: dict[str, dict] = {}
    for name in _STREAM_QUERIES:
        progresses.clear()
        t0 = time.perf_counter()
        try:
            registry.QUERIES[name](spark, sf_dir).collect()
        except Exception as exc:
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            spark.catalog.clearCache()
            continue
        wall = round(time.perf_counter() - t0, 4)
        spark.catalog.clearCache()
        # one query fn can drain several streaming queries; aggregate all
        # progress events it emitted
        batches = list(progresses)
        dur_keys = (
            "addBatch",
            "getBatch",
            "latestOffset",
            "queryPlanning",
            "triggerExecution",
            "walCommit",
            "commitOffsets",
        )
        durs = {k: 0 for k in dur_keys}
        state = {"commitTimeMs": 0, "numRowsTotal": 0, "memoryUsedBytes": 0}
        for p in batches:
            for k in dur_keys:
                durs[k] += p.get("durationMs", {}).get(k, 0)
            for so in p.get("stateOperators", []):
                state["commitTimeMs"] += so.get("allUpdatesTimeMs", 0) + so.get(
                    "commitTimeMs", 0
                )
                state["numRowsTotal"] = max(
                    state["numRowsTotal"], so.get("numRowsTotal", 0)
                )
                state["memoryUsedBytes"] += so.get("memoryUsedBytes", 0)
        engine_ms = durs["triggerExecution"] - durs["addBatch"]
        results[name] = {
            "wall_sec": wall,
            "n_progress_events": len(batches),
            "duration_ms": durs,
            "state": state,
            # triggerExecution - addBatch = micro-batch machinery
            # (planning, offset tracking, WAL) per drain
            "engine_overhead_ms": engine_ms,
            "addbatch_share": round(
                durs["addBatch"] / durs["triggerExecution"], 3
            )
            if durs["triggerExecution"]
            else None,
        }
        print(
            f"{name}: wall {wall:.2f}s batches {len(batches)} "
            f"addBatch {durs['addBatch']}ms trigger {durs['triggerExecution']}ms",
            file=sys.stderr,
        )

    out = json.dumps(results, indent=1)
    tmp = args.out + ".tmp"
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
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
