#!/bin/bash
# Round-16 task 2: measure the governing data-dependent queries at the
# K=100 fixture. One fresh JVM per STATE FAMILY (comma-grouped ProfSkew
# names): the in-memory catalog cannot carry a bucketed CTAS across
# JVMs, so per-query JVMs would pay the 100x family state build once
# per query; grouping pays it once per family while keeping
# cache-heavy families out of each other's storage pool (the r15
# instrument note). Quote rep 2 (rep 1 carries the build).
# ProfSkew prints wall, s-cpu, per-stage skew AND the per-job driver
# timeline (inter-job gaps = driver-side work task metrics can't see).
set -u
FIX=${1:-/tmp/graft_sf100x}
OUT=${2:-/tmp/prof100x}
# java.io.tmpdir is NOT auto-created by the JVM — a fresh host fails
# every File.createTempFile under it without this (ADVICE r16).
mkdir -p "$OUT" /tmp/v3x_tmp
for grp in dd_incremental_contamination \
           er_incremental_clusters,er_incremental_clusters_capped,er_incremental_survivorship \
           pg_incremental_triangles \
           st_incremental_clusters,st_incremental_clusters_capped; do
  tag=$(echo "$grp" | cut -d, -f1)
  echo "=== $grp ==="
  RUNJAR_OPTS="-Djava.io.tmpdir=/tmp/v3x_tmp -Dspark.executor.heartbeatInterval=30s -Dspark.network.timeout=600s" \
  /root/repo/tools/runjar.sh -mem 85g graft.ProfSkew "$grp" "$FIX" 2 \
    > "$OUT/$tag.log" 2>&1
  # Preview scaled to the group size (ADVICE r16: a fixed tail -16
  # hid the first members of the 3-query er_* group) — the full log is
  # in $OUT/$tag.log either way.
  n=$(echo "$grp" | tr ',' '\n' | wc -l)
  grep -E '^\[skew\]' "$OUT/$tag.log" | grep -vE 'stage +[0-9]' | tail -$((16 * n))
done
echo PROF100X_DONE
