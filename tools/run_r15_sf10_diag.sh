#!/bin/bash
# r15 ask #4: separate GC from plan growth for the two >1.1 sf10
# exponents (label_propagation_communities 1.27, market_basket_part_pairs
# 1.20 at 32g — evidence/bench_r14_sf{1,10}_cpus32_32g_subset.json).
#
# Three single-sample configs at sf10, fresh JVM each, GC-logged:
#   A  32g, 32 shuffle partitions  — r14 baseline replication
#   B  64g, 32 partitions          — if faster, the exponent is heap/GC
#   C  32g, 128 partitions         — if faster, it is partition SIZE
#      (fixed local parallelism means 10x fatter partitions at sf10; a
#      real cluster scales partition count with data)
# Run UNCONTENDED. ~25 min total.
set -e
cd "$(dirname "$0")/.."
Q=label_propagation_communities,market_basket_part_pairs
export SPARK_GRAFT_SF_DIR=/root/repo/data/sf10
export SPARK_GRAFT_QUERIES=$Q
export SPARK_GRAFT_REPEAT_FLOOR=1000000000   # single sample, long runs

run () {  # name mem partitions
  echo "=== $1 (mem=$2, sp=$3) ==="
  SPARK_GRAFT_DRIVER_MEM=$2 SPARK_SHUFFLE_PARTITIONS=$3 \
  SPARK_GRAFT_JAVA_EXTRA="-Xlog:gc:/tmp/gc_r15_$1.log" \
  python bench.py > "evidence/diag_r15_sf10_$1.json" 2> "/tmp/bench_r15_$1.err"
  tail -c 400 "evidence/diag_r15_sf10_$1.json"; echo
}

run A_32g_sp32 32g 32
run B_64g_sp32 64g 32
run C_32g_sp128 32g 128

for n in A_32g_sp32 B_64g_sp32 C_32g_sp128; do
  echo "--- GC pause total $n:"
  grep 'Pause' /tmp/gc_r15_$n.log | grep -o '[0-9.]*ms$' \
    | awk '{gsub(/ms/,""); s+=$1} END {printf "%.1f s across %d pauses\n", s/1000, NR}' || true
done
