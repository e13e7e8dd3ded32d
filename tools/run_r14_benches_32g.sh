#!/bin/bash
# r14 bench phase, part 2 - run UNCONTENDED after the sf1 rest-parity
# sweep finishes. The first sf10 pass (tools/run_r14_benches.sh) ran at
# the session default 8g driver heap - measured optimal through sf1,
# but at sf10 the heavy family OOMed the local-mode JVM 15 queries in
# (java.lang.OutOfMemoryError: Java heap space during
# label_propagation_communities' localCheckpoint; every later query
# then failed on the stopped SparkContext - see
# evidence/bench_r14_sf10_cpus32_subset.json "failed").
#
# This pass re-runs the 17 OOM-failed queries at SPARK_GRAFT_DRIVER_MEM
# =32g on BOTH scale points, so each query's exponent pair is
# same-heap; dedup_clusters and date_cast_cascade (measured at 8g with
# the two highest exponents, 1.31/1.22, possibly heap-pressure
# inflated) join the re-run as an A/B check. On a real cluster this is
# per-executor memory sizing; in local mode all 32 executor threads
# share the one driver heap, so the 8g-vs-32g split IS the
# executor-memory knob.
set -u
cd /root/repo

RERUN="label_propagation_communities,market_basket_part_pairs,minhash_lsh_near_dup,multimodal_png_decode_stats,near_dup_recall_eval,near_dup_removal_impact,negative_sampling_recs,ngram_jaccard_near_dup,pagerank_trade_graph,recsys_holdout_eval,simhash_hamming_pairs,stateful_running_totals,stream_dedup_events,stream_rate_limit_flags,stream_session_rollup,token_ngram_vocab,triangle_count_parts,dedup_clusters,date_cast_cascade"

echo "=== 1/2 sf1 rerun-19 at 32g $(date +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/repo/data/sf1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_DRIVER_MEM=32g \
  SPARK_GRAFT_QUERIES="$RERUN" SPARK_GRAFT_REPEAT_FLOOR=1e9 \
  SPARK_GRAFT_BENCH_OUT=evidence/bench_r14_sf1_cpus32_32g_subset.json \
  python3 bench.py 2>/tmp/bench_sf1_32g.err
echo "rc=$?"

echo "=== 2/2 sf10 rerun-19 at 32g $(date +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/repo/data/sf10 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_DRIVER_MEM=32g \
  SPARK_GRAFT_QUERIES="$RERUN" SPARK_GRAFT_REPEAT_FLOOR=1e9 \
  SPARK_GRAFT_BENCH_OUT=evidence/bench_r14_sf10_cpus32_32g_subset.json \
  python3 bench.py 2>/tmp/bench_sf10_32g.err
echo "rc=$?"

echo "=== audit (32g pair) $(date +%H:%M:%S)"
python3 tools/scaling_audit.py evidence/bench_r14_sf1_cpus32_32g_subset.json \
  evidence/bench_r14_sf10_cpus32_32g_subset.json --allow-missing \
  > /tmp/audit_sf10_32g.txt 2>&1
echo "audit rc=$?"
echo ALL_32G_DONE
