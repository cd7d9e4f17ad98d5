#!/usr/bin/env bash
# Scale-subset bench: the dedup / ANN / decontaminate / CDC scale-path
# families only (the queries whose cost is corpus-shaped, not fixed).
# Usage: tools/bench_scale.sh <sfDir> <outJson> [runs]
#
# Hardened after three rounds of invalid sf10 artifacts:
#  - the stale spark.local.dir is wiped BEFORE the run (the r9 failure
#    was 60 GB of accumulated spill from prior runs starving the box to
#    <20 GB free — the SparkContext died on a full disk and every query
#    "finished" in ~7 ms);
#  - the run writes to a temp file and only moves it into place when
#    graft.Bench exits 0 (Bench now exits 1 when any query failed or the
#    SparkContext died) — a failed run can no longer leave a
#    success-shaped artifact behind;
#  - a free-disk preflight refuses to start a run that would die the
#    same way.
set -euo pipefail
cd "$(dirname "$0")/.."
sf=${1:?usage: bench_scale.sh <sfDir> <outJson> [runs]}
out=${2:?usage: bench_scale.sh <sfDir> <outJson> [runs]}
runs=${3:-3}

# Per-PID default: a fixed path is a foot-gun — a killed run's EXIT
# trap (rm -rf below) deletes the dir out from under any run launched
# after the kill but before the wrapper exits (observed as
# FileNotFoundException on shuffle blocks mid-run). The override stays
# for callers that pin placement deliberately.
LOCAL_DIR=${SPARK_LOCAL_DIR_OVERRIDE:-/tmp/spark-bench-local-$$}
# Sweep per-PID dirs whose owning wrapper is gone (a SIGKILLed wrapper
# never runs its trap) — but never a live run's dir. Liveness check is
# /proc, not `kill -0`: kill -0 also fails with EPERM for a live process
# owned by another user, which would sweep a live run's dir out from
# under it on a shared box.
for d in /tmp/spark-bench-local-*; do
  pid=${d##*-}
  if [[ "$pid" =~ ^[0-9]+$ ]] && [ ! -d "/proc/$pid" ]; then
    rm -rf "$d"
  fi
done
rm -rf "$LOCAL_DIR"
mkdir -p "$LOCAL_DIR"

# sf10 peaks ~45 GB of shuffle/spill on this subset; demand headroom —
# but only at the decades that need it. An unconditional 55 GB floor
# refused perfectly-feasible sf0.1/sf1 runs on a 30 GB-free box, so the
# default scales with the target dir's on-disk size (spill has measured
# ~5-8x the input at the worst sf10 queries; 10x + 5 GB slack is the
# honest envelope). MIN_FREE_GB still overrides.
if [ -z "${MIN_FREE_GB:-}" ]; then
  sf_gb=$(du -sBG "$sf" 2>/dev/null | awk '{print $1}' | tr -dc '0-9')
  sf_gb=${sf_gb:-1}
  MIN_FREE_GB=$(( sf_gb * 10 + 5 ))
  [ "$MIN_FREE_GB" -gt 55 ] && MIN_FREE_GB=55
fi
free_gb=$(df -BG --output=avail "$LOCAL_DIR" | tail -1 | tr -dc '0-9')
if [ "$free_gb" -lt "$MIN_FREE_GB" ]; then
  echo "refusing to run: ${free_gb} GB free under $LOCAL_DIR, need >= ${MIN_FREE_GB} GB" >&2
  exit 2
fi

# Overridable (SUBSET env). The exact-overlap trio (dedup_ngram_jaccard
# / dedup_containment / dedup_clusters) was excluded from this default
# for rounds 7-10: the df-split overlap_pairs build spilled ~60 GB at
# sf10 and starved the disk (killed the r8/r9 runs). The r11
# prefix-filtered build (partition-count bound + codegen min-sum,
# Dedup.overlapPairsPlan) completes the same rung in ~42 s with no disk
# pressure, so the default is now the FULL corpus subset — the original
# 20 plus the three r11 span-family queries, plus (r14) the incremental
# IVF-PQ query and the pixel-decode kernel so future rungs screen them.
SUBSET="${SUBSET:-dedup_exact,dedup_incremental,dedup_minhash_lsh,dedup_simhash,dedup_embedding_cosine,dedup_ngram_jaccard,dedup_containment,dedup_clusters,dedup_keep_best_minhash,dedup_repeated_spans,dedup_clip_repeated,text_decontaminate,text_decontaminate_spans,text_clip_contaminated,text_decontaminate_bloom,text_winnow_fingerprint,ann_cosine_topk,ann_lsh_topk,ann_ivf_topk,ann_pq_topk,ann_ivfpq_incremental,ann_range_search,multimodal_pixel_stats,cdc_snapshot,cdc_snapshot_multitable,cdc_audit_log,cdc_consistency_diff}"

ADD_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
    java.net java.nio java.util java.util.concurrent \
    java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action \
    sun.util.calendar; do
  printf -- "--add-opens java.base/%s=ALL-UNNAMED " "$p"
done)

tmp=$(mktemp)
trap 'rm -f "$tmp"; rm -rf "$LOCAL_DIR"' EXIT
# EXTRA_JAVA_OPTS: caller-supplied -D flags (e.g. forcing
# spark.graft.* regime knobs for an observation run)
if SPARK_GRAFT_SF_DIR=$sf SPARK_GRAFT_CPUS=32 \
   SPARK_GRAFT_BENCH_ONLY="$SUBSET" SPARK_GRAFT_BENCH_RUNS=$runs \
   java $ADD_OPENS -Xmx48g -Dspark.ui.enabled=false \
     -Dspark.local.dir="$LOCAL_DIR" ${EXTRA_JAVA_OPTS:-} \
     -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
     | grep '"metric"' > "$tmp"
then
  mv "$tmp" "$out"
  trap 'rm -rf "$LOCAL_DIR"' EXIT
  echo "wrote $out"
else
  echo "bench FAILED (exit nonzero) — no artifact written to $out" >&2
  exit 1
fi
