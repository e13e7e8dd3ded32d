#!/bin/bash
# r14 bench phase - run UNCONTENDED, sequentially:
#   1. sf0.1 checksum trio (closes the r13 d769127 post-fix envelope note)
#   2. sf1 heavy-32 subset (current tree, same session as the sf10 run)
#   3. sf10 heavy-32 subset (third decade)
# Exponent pairs (2) vs (3) use the same single-sample treatment on both
# sides (SPARK_GRAFT_REPEAT_FLOOR disables min-of-2 symmetrically).
set -u
cd /root/repo

HEAVY="multimodal_png_decode_stats,recsys_holdout_eval,triangle_count_parts,stream_session_rollup,dedup_clusters,containment_near_dup,label_propagation_communities,item_item_recs,ngram_jaccard_near_dup,near_dup_recall_eval,doc_repetition_stats,dup_ngram_span_share,benchmark_decontam_overlap,negative_sampling_recs,pagerank_trade_graph,stream_rate_limit_flags,fuzzy_name_matches,degree_assortativity,cosine_vs_l2_rank_agreement,khop_part_reach,assoc_rules_lift,minhash_lsh_near_dup,bpe_apply_top_merge,near_dup_removal_impact,bootstrap_ci_event_value,stateful_running_totals,incremental_lsh_dedup,date_cast_cascade,simhash_hamming_pairs,market_basket_part_pairs,token_ngram_vocab,stream_dedup_events"

echo "=== 1/3 sf0.1 checksum trio $(date +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_QUERIES="orders_table_checksum,replica_bucket_reconcile,compact_small_files" \
  SPARK_GRAFT_BENCH_OUT=evidence/bench_r14_sf0.1_checksums.json \
  python3 bench.py 2>/tmp/bench_ck.err
echo "rc=$?"

echo "=== 2/3 sf1 heavy-32 subset $(date +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/repo/data/sf1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_QUERIES="$HEAVY" SPARK_GRAFT_REPEAT_FLOOR=1e9 \
  SPARK_GRAFT_BENCH_OUT=evidence/bench_r14_sf1_cpus32_subset.json \
  python3 bench.py 2>/tmp/bench_sf1.err
echo "rc=$?"

echo "=== 3/3 sf10 heavy-32 subset $(date +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/repo/data/sf10 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_QUERIES="$HEAVY" SPARK_GRAFT_REPEAT_FLOOR=1e9 \
  SPARK_GRAFT_BENCH_OUT=evidence/bench_r14_sf10_cpus32_subset.json \
  python3 bench.py 2>/tmp/bench_sf10.err
echo "rc=$?"

echo "=== audit $(date +%H:%M:%S)"
python3 tools/scaling_audit.py evidence/bench_r14_sf1_cpus32_subset.json \
  evidence/bench_r14_sf10_cpus32_subset.json --allow-missing \
  > /tmp/audit_sf10.txt 2>&1
echo "audit rc=$?"
echo ALL_BENCHES_DONE
