#!/bin/bash
# Sequential real-TPU measurement ledger (one TPU process at a time).
# Usage: scripts/tpu_ledger.sh [outfile]
# Each step is a fresh process; bench.py's BENCH_WATCHDOG_S exits with
# a JSON error line instead of hanging if the tunnel wedges.
#
# ONE declared numerics column: every unlabeled row runs the shipped
# serving config (int16 per-row KV + packed_int argmax +
# alignment-free — bench.py defaults, = ModelConfig defaults, = the
# parity table in crosscheck/serving_agreement.json). Rows that pin a
# DIFFERENT numerics config say so in their label; they are ablations,
# not alternative headlines.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_ledger.log}"
export BENCH_WATCHDOG_S="${BENCH_WATCHDOG_S:-900}"

run() {
  local label="$1"; shift
  echo "=== $label ($(date +%H:%M:%S)) ===" >> "$OUT"
  "$@" >> "$OUT" 2>&1
  echo "--- exit $? ---" >> "$OUT"
}

: > "$OUT"
# --- declared serving config (the headline column) ---
run "headline B=2048"         python bench.py
run "headline B=1024"         env BENCH_BATCH=1024 python bench.py
run "headline shortlist w=1024" python bench.py headline_shortlist
run "devstep (components vs rooflines)" python bench.py devstep
run "batch1"                  python bench.py batch1
run "base model"              python bench.py base
run "e2e service"             python bench.py e2e
run "real corpus (cache+shortlist stats)" python bench.py realcorpus
run "shortlist via service"   python bench.py shortlist
run "bulk corpus"             python bench.py bulk
run "async corpus"            python bench.py corpus
run "multipair"               python bench.py multipair
run "pivot"                   python bench.py pivot
run "serving latency (open-loop Poisson)" python bench.py latency
# --- ablations (explicitly non-default numerics) ---
run "ABLATION headline int8 KV (faster, looser agreement)" env BENCH_KV=int8 python bench.py
run "ABLATION headline bf16 KV" env BENCH_KV=bfloat16 python bench.py
run "ABLATION headline fp16 KV" env BENCH_KV=float16 python bench.py
run "ABLATION headline exact argmax" env BENCH_ARGMAX=exact python bench.py
run "ABLATION headline packed_fp16 argmax (r3/r4 default)" env BENCH_ARGMAX=packed_fp16 python bench.py
run "batch1 fused_step (declared int16 numerics, latency regime)" env BENCH_PROVIDER=fused_step python bench.py batch1
run "ABLATION batch1 fused_step bf16 KV" env BENCH_PROVIDER=fused_step BENCH_KV=bfloat16 python bench.py batch1
run "continuous batching vs batch-at-a-time" python bench.py continuous
run "ABLATION providers"      python bench.py providers
run "long-context encoder (flash vs einsum)" python bench.py longctx
echo "LEDGER DONE $(date +%H:%M:%S)" >> "$OUT"
