#!/bin/bash
# Round-16 task 2: measure the five governing data-dependent queries at
# the K=100 fixture (one fresh JVM per query — the r15 instrument note:
# multi-query Prof sessions cross-evict cached frames; quote rep 2).
# ProfSkew prints wall, s-cpu, per-stage skew AND the per-job driver
# timeline (inter-job gaps = driver-side work task metrics can't see).
set -u
FIX=${1:-/tmp/graft_sf100x}
OUT=${2:-/tmp/prof100x}
mkdir -p "$OUT"
for q in dd_incremental_contamination er_incremental_clusters \
         er_incremental_clusters_capped er_incremental_survivorship \
         pg_incremental_triangles st_incremental_clusters_capped \
         st_incremental_clusters; do
  echo "=== $q ==="
  /root/repo/tools/runjar.sh graft.ProfSkew "$q" "$FIX" 2 \
    > "$OUT/$q.log" 2>&1
  grep -E '^\[skew\]' "$OUT/$q.log" | grep -vE 'stage +[0-9]' | tail -8
done
echo PROF100X_DONE
