#!/bin/bash
# Run a graft main from the packaged jar, decoupled from sbt (so source
# edits/compiles never race a long-running forked JVM — the r16 workflow
# for full Verify / Bench sweeps in tmux).
#   tools/runjar.sh [-mem 100g] graft.Verify /root/testdata/sf0.01 /tmp/out
# RUNJAR_OPTS: extra JVM flags (e.g. -Djava.io.tmpdir=/tmp/vwork_1/tmp for
# partitioned parallel sweeps, so instances never share staging paths).
MEM=100g
if [ "$1" = "-mem" ]; then MEM="$2"; shift 2; fi
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -Xmx$MEM $ADDOPENS --add-modules jdk.incubator.vector ${RUNJAR_OPTS:-} \
  -cp "/root/repo/target/scala-2.13/ningalooturtleetlspark_2.13-0.1.0.jar:/opt/spark/jars/*" "$@"
