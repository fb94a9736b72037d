#!/bin/bash
# Chaos check for the bench contention defense (VERDICT r14 #1 done
# criterion): run Bench on a key subset twice — once idle, once with a
# stress load pinning half the cores for a window mid-run — then assert
# (scripts/chaos_compare.py) that the stressed capture's medians land
# within the normal band of the idle ones for >= 95% of keys. The
# canary flag + post-pass re-run machinery in Bench.scala is what makes
# that hold; without it the windowed keys report blown medians (the
# round-14 driver capture pattern).
#
# Env knobs:
#   CHAOS_KEYS   comma list for SPARK_GRAFT_BENCH_ONLY (default: the 20
#                keys the r14 window blew + the heavy graph/trainer keys)
#   CHAOS_SF     data dir (default /root/testdata/sf0.1)
#   CHAOS_DELAY  seconds into the stressed run before load starts (60)
#   CHAOS_DUR    stress window length in seconds (300)
#   CHAOS_NPROC  busy-loop processes, i.e. cores pinned (16 = half of 32)
set -euo pipefail
cd "$(dirname "$0")/.."

DEFAULT_KEYS=q_markov_attribution,q_mmd_poly,q_media_clusters,q_frame_dedup,q_profile,q_semantic_clusters,q_mixture_apply,q_minhash_lsh,q_obrien_fleming,q_ols_trend,q_hits,q_mst_boruvka,q_source_ablation,q_fed_avg,q_spectral_radius,q_lr_sweep,q_membership_infer,q_pagerank,q_kcore,q_graph_diameter,q_logreg_step,q_grad_topk,q_self_bleu,q_bm25,q_wand_bounds,q_term_proximity,q_simhash_pairs,q_dedup_clusters_full,q_topk_group_count,q_join_group_count,q_pricing_summary,q_knn_neighbors,q_cosine_topk,q_histogram,q_summary_stats
KEYS="${CHAOS_KEYS:-$DEFAULT_KEYS}"
SF="${CHAOS_SF:-/root/testdata/sf0.1}"
DELAY="${CHAOS_DELAY:-60}"
DUR="${CHAOS_DUR:-300}"
NPROC="${CHAOS_NPROC:-16}"

echo "[chaos] idle reference pass..."
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_ONLY="$KEYS" \
  SPARK_GRAFT_BENCH_OUT=target/chaos_idle.json \
  sbt -batch "runMain graft.Bench" > target/chaos_idle.log 2>&1

echo "[chaos] stressed pass: +${DELAY}s -> ${NPROC} spinners for ${DUR}s..."
(
  sleep "$DELAY"
  echo "[chaos] stress ON ($(date +%s))"
  for _ in $(seq "$NPROC"); do
    python3 -c "
import time
t = time.time() + $DUR
while time.time() < t:
    pass" &
  done
  wait
  echo "[chaos] stress OFF ($(date +%s))"
) &
STRESS_PID=$!

SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_ONLY="$KEYS" \
  SPARK_GRAFT_BENCH_OUT=target/chaos_stressed.json \
  sbt -batch "runMain graft.Bench" > target/chaos_stressed.log 2>&1
cp target/bench_reps.json target/chaos_stressed_reps.json

wait "$STRESS_PID" || true
python3 scripts/chaos_compare.py target/chaos_idle.json target/chaos_stressed.json
