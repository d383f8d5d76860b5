#!/bin/bash
# Scale sweep runner (round-14 form of the PLANS_r11 §4a recipe).
# Run ONLY on a committed tree with no other JVMs live — graft.Bench
# timings are the artifact of record. Stages run strictly in
# sequence; each tier writes its own bench_{1x,10x,100x}.json.
#
# Usage: scripts/run_sweep.sh [1x|10x|100x|all]
set -euo pipefail
cd "$(dirname "$0")/.."

JAVA_OPTS=(
  --add-opens=java.base/java.lang=ALL-UNNAMED
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED
  --add-opens=java.base/java.io=ALL-UNNAMED
  --add-opens=java.base/java.net=ALL-UNNAMED
  --add-opens=java.base/java.nio=ALL-UNNAMED
  --add-opens=java.base/java.util=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED
  --add-opens=java.base/sun.security.action=ALL-UNNAMED
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED
)
CP="target/scala-2.13/classes:/opt/spark/jars/*"

# the swept set: every 100x-tier query (the r13 TBD100 list) plus the
# two containment forms. q_ngram_containment (the documented quadratic
# verification twin) runs the 1x/10x tiers only; the prefix scale path
# runs ALL tiers as of r14 (the broadcast-probe verify landed its 100x).
QUERIES_COMMON=(
  q_audio_search q_audio_ingest_gate q_audio_neardup q_audio_fingerprint
  q_audio_dedup_clusters q_audio_windows q_audio_features
  q_basket_pmi q_corpus_drift q_skipgram_pairs q_negative_samples
  q_linreg q_video_ingest_gate q_video_dedup_clusters q_video_neardup
  q_image_ingest_gate q_video_search q_video_features q_image_neardup
  q_image_dedup_clusters q_image_search q_video_frames q_video_phash
  q_feature_hash q_video_signature q_hhi q_zipf_fit q_auc q_image_phash
  q_ngram_containment_prefix q_containment_pipeline
)

run_tier() {
  local dir="$1" parts="$2" out="$3"; shift 3
  echo "=== tier $out: $dir parts=$parts $(date -u +%H:%M:%S) ==="
  # -Xmx100g: the 100x tier NEEDS the box-sized heap — the r14 sweep
  # learned this the hard way: under the default 32 GB heap the
  # containment-prefix broadcast-verify at 100x GC-locker-thrashed
  # until spill temp files errored out and the whole tier's artifact
  # (written only at Bench exit) was lost on the LAST query
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_SHUFFLE_PARTITIONS="$parts" \
  SPARK_GRAFT_BENCH_OUT="$out" \
    java -Xmx100g "${JAVA_OPTS[@]}" -cp "$CP" graft.Bench "$@" \
      2>"$out.err" | tail -1
}

probe() { # candidate-reduction probe for the pipeline-ordering claim
  local dir="$1" parts="$2" out="$3"
  echo "=== PipelineProbe $dir parts=$parts $(date -u +%H:%M:%S) ==="
  java -Xmx100g "${JAVA_OPTS[@]}" -cp "$CP" graft.tools.PipelineProbe \
    "$dir" "$parts" 2>"$out.err" | tail -1 | tee "$out"
}

synth() { # scale dir if missing
  local dir="$1" factor="$2"
  if [ ! -d "$dir" ]; then
    echo "=== ScaleSynth $dir x$factor ==="
    java "${JAVA_OPTS[@]}" -cp "$CP" graft.tools.ScaleSynth \
      /root/testdata/sf0.1 "$dir" "$factor" 2>/dev/null | tail -1
  fi
}

tier="${1:-all}"
case "$tier" in
  1x|all)
    run_tier /root/testdata/sf0.1 32 bench_1x.json \
      "${QUERIES_COMMON[@]}" q_ngram_containment
    probe /root/testdata/sf0.1 32 pipeline_probe_1x.json ;;&
  10x|all)
    synth /tmp/scale10 10
    run_tier /tmp/scale10 64 bench_10x.json \
      "${QUERIES_COMMON[@]}" q_ngram_containment
    probe /tmp/scale10 64 pipeline_probe_10x.json ;;&
  100x|all)
    synth /tmp/scale100 100
    run_tier /tmp/scale100 256 bench_100x.json "${QUERIES_COMMON[@]}"
    probe /tmp/scale100 256 pipeline_probe_100x.json ;;
esac
echo "=== sweep done $(date -u +%H:%M:%S) ==="
