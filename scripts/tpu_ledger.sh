#!/bin/bash
# Sequential real-TPU measurement ledger (one TPU process at a time).
# Usage: scripts/tpu_ledger.sh [outfile]
# Each step is a fresh process; bench.py's BENCH_WATCHDOG_S exits with
# a JSON error line instead of hanging if the tunnel wedges.
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
# Headline defaults to int8 KV; every row pins BENCH_KV/BENCH_BATCH
# explicitly so labels always match what was measured.
run "headline bf16 KV"        env BENCH_KV=bfloat16 python bench.py
run "headline int8 KV (per-row scales)" env BENCH_KV=int8 python bench.py
run "headline B=1024 int8 KV (history comparison)" env BENCH_BATCH=1024 BENCH_KV=int8 python bench.py
run "batch1 default"          python bench.py batch1
run "batch1 fused_step"       env BENCH_PROVIDER=fused_step python bench.py batch1
run "base model"              python bench.py base
run "e2e service"             python bench.py e2e
run "real corpus (cache+shortlist stats)" python bench.py realcorpus
run "shortlist"               python bench.py shortlist
run "bulk corpus"             python bench.py bulk
run "async corpus"            python bench.py corpus
run "multipair"               python bench.py multipair
run "pivot"                   python bench.py pivot
run "providers"               python bench.py providers
run "headline B=2048 int8 KV" env BENCH_BATCH=2048 BENCH_KV=int8 python bench.py
run "headline B=2048 bf16 KV" env BENCH_BATCH=2048 BENCH_KV=bfloat16 python bench.py
echo "LEDGER DONE $(date +%H:%M:%S)" >> "$OUT"
