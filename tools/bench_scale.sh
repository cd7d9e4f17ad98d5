#!/usr/bin/env bash
# Scale-subset bench: the dedup / ANN / decontaminate / CDC scale-path
# families only (the queries whose cost is corpus-shaped, not fixed).
# Usage: tools/bench_scale.sh <sfDir> <outJson> [runs]
set -euo pipefail
cd "$(dirname "$0")/.."
sf=${1:?usage: bench_scale.sh <sfDir> <outJson> [runs]}
out=${2:?usage: bench_scale.sh <sfDir> <outJson> [runs]}
runs=${3:-3}

# Overridable (SUBSET env): at sf10-equivalent volume on this box the
# exact-overlap shared index (overlap_pairs: dedup_ngram_jaccard /
# dedup_containment / dedup_clusters) spills past the local disk —
# linear growth (the HotDf·|occurrences| bound) but a ~×256 constant;
# its corpus-scale rung is the banded/sketched family (minhash/simhash),
# which stays in the subset. Same stance as the ScaleProbe exclusions.
SUBSET="${SUBSET:-dedup_exact,dedup_incremental,dedup_minhash_lsh,dedup_simhash,dedup_ngram_jaccard,dedup_containment,dedup_clusters,dedup_embedding_cosine,text_decontaminate,text_decontaminate_bloom,text_winnow_fingerprint,ann_cosine_topk,ann_lsh_topk,ann_ivf_topk,ann_pq_topk,ann_range_search,cdc_snapshot,cdc_snapshot_multitable,cdc_audit_log,cdc_consistency_diff}"

ADD_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
    java.net java.nio java.util java.util.concurrent \
    java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action \
    sun.util.calendar; do
  printf -- "--add-opens java.base/%s=ALL-UNNAMED " "$p"
done)

SPARK_GRAFT_SF_DIR=$sf SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_ONLY="$SUBSET" SPARK_GRAFT_BENCH_RUNS=$runs \
java $ADD_OPENS -Xmx48g -Dspark.ui.enabled=false \
  -Dspark.local.dir=/tmp/spark-bench-local \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
  | grep '"metric"' > "$out"
echo "wrote $out"
