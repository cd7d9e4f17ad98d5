#!/usr/bin/env bash
# Same-box control bench: rebuild a prior round's commit in a worktree
# and run the full driver bench on TODAY'S box — the attribution
# artifact that separates code drift from environment drift (the r10/r12
# discipline, now one command; commit the output beside the round's own
# bench). A raw cross-round comparison without this control misread the
# r12 environment slowdown as a 1.66x code regression.
#
# Usage: tools/bench_control.sh <commit> <sfDir> <outJson> [runs]
set -euo pipefail
cd "$(dirname "$0")/.."
commit=${1:?usage: bench_control.sh <commit> <sfDir> <outJson> [runs]}
sf=${2:?usage: bench_control.sh <commit> <sfDir> <outJson> [runs]}
out=${3:?usage: bench_control.sh <commit> <sfDir> <outJson> [runs]}
runs=${4:-3}

wt=/tmp/graft-control-$commit
if [ ! -d "$wt" ]; then
  git worktree add "$wt" "$commit" >/dev/null
fi
(cd "$wt" && sbt -batch compile | tail -1 >&2)

ADD_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
    java.net java.nio java.util java.util.concurrent \
    java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action \
    sun.util.calendar; do
  printf -- "--add-opens java.base/%s=ALL-UNNAMED " "$p"
done)

LOCAL_DIR=/tmp/spark-bench-local-$$
rm -rf "$LOCAL_DIR"; mkdir -p "$LOCAL_DIR"
tmp=$(mktemp)
trap 'rm -f "$tmp"; rm -rf "$LOCAL_DIR"' EXIT
# SUBSET (optional): restrict the control to the same query subset as
# the rung being attributed — a decade-rung control must run the decade
# shape, not the full driver bench.
if [ -n "${SUBSET:-}" ]; then export SPARK_GRAFT_BENCH_ONLY="$SUBSET"; fi
if SPARK_GRAFT_SF_DIR=$sf SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_RUNS=$runs \
   java $ADD_OPENS -Xmx48g -Dspark.ui.enabled=false \
     -Dspark.local.dir="$LOCAL_DIR" \
     -cp "$wt/target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
     | grep '"metric"' > "$tmp"
then
  mv "$tmp" "$out"
  echo "wrote $out (control: $commit on today's box)"
else
  echo "control bench FAILED (exit nonzero) — no artifact written" >&2
  exit 1
fi
