#!/usr/bin/env bash
# Scaling probe: measure the documents-family operators on 1x / 2x / 4x
# replica-salted corpora (tools/scaling_probe.py) and report the wall
# ratios. Replicas share no shingles, so growth is the natural-content
# regime — a bucket-shaped operator should scale ~linearly (ratio ~= K
# plus the fixed session/stage floor), while an accidental all-pairs
# shape would blow up ~K^2. The per-query numbers land in
# /tmp/scale_bench_K.json (full bench JSON with forensics fields).
set -euo pipefail
cd "$(dirname "$0")/.."

OPS=${SCALING_OPS:-dedup_exact,dedup_ngram_jaccard,dedup_minhash_lsh,dedup_simhash,dedup_substring,dedup_components,dedup_containment,text_tfidf,pipeline_clean,mr_wordcount,pipeline_decontam,q_sessionize,q_funnel,q_range_join,q_asof_join,q_gap_fill,events_markov,events_retention,events_attribution,events_changepoint,events_rfm,events_paths}

for K in 1 2 4; do
  dir=/tmp/scale_$K
  rm -rf "$dir"
  python3 tools/scaling_probe.py "$K" "$dir"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_REPS=${SCALING_REPS:-2} \
    SPARK_GRAFT_BENCH_FILTER="$OPS" \
    SPARK_GRAFT_BENCH_OUT=/tmp/scale_bench_$K.json \
    sbt -batch "runMain graft.Bench" > /tmp/scale_bench_$K.log 2>&1
done

python3 - <<'EOF'
import json
runs = {k: json.load(open(f"/tmp/scale_bench_{k}.json")) for k in (1, 2, 4)}
qs = sorted(runs[1]["queries"])
print(f"{'operator':24s} {'1x':>7s} {'2x':>7s} {'4x':>7s} {'4x/1x':>6s}")
for q in qs:
    t = [runs[k]["queries_min"][q] for k in (1, 2, 4)]
    print(f"{q:24s} {t[0]:7.2f} {t[1]:7.2f} {t[2]:7.2f} {t[2]/t[0]:6.2f}")
tot = [sum(runs[k]["queries_min"].values()) for k in (1, 2, 4)]
print(f"{'TOTAL (min-of-reps)':24s} {tot[0]:7.2f} {tot[1]:7.2f} {tot[2]:7.2f} {tot[2]/tot[0]:6.2f}")
print("loadavg:", [(runs[k]['loadavg_start'], runs[k]['loadavg_end']) for k in (1,2,4)])
EOF
