#!/bin/bash
# Round-5 tuning sweep for the weakest perf row (VERDICT r4 weak #5):
# synth-100M rank-128 (r3: 3.06 s/epoch, 229k rows/s, 127x; untouched in
# r4). Sweeps the three untried levers at (k=128, 100M nnz):
#   - gather budgets between the 256 MB nnz-gated auto and the 17.4 GB
#     unsplit OOM cliff,
#   - dense-whale threshold retuned at this scale (tuned at ML-25M only),
#   - hot-column slab re-enabled (hot_cols_auto(128)=0 was measured at
#     ML-25M only), and bucket growth 1.12.
# Whole-epoch numbers only (isolated probes have repeatedly misled —
# CLAUDE.md). Outputs to docs/measurements/r5/tune100m/.
set -u
OUT=${OUT:-/root/repo/docs/measurements/r5/tune100m}
MAX_LOAD=${MAX_LOAD:-4}
mkdir -p "$OUT"
cd /root/repo

idle_or_die() {
  local load
  load=$(cut -d' ' -f1 /proc/loadavg)
  python3 -c "import sys; sys.exit(0 if float('$load') < float('$MAX_LOAD') else 1)" && return 0
  echo "REFUSING to time under load: loadavg $load >= $MAX_LOAD" | tee -a "$OUT/log"
  exit 2
}

run() {  # run <name> <timeout_s> <env...>
  local name=$1 t=$2; shift 2
  idle_or_die
  echo "=== $name ($(date +%H:%M:%S), load $(cut -d' ' -f1 /proc/loadavg)) ===" | tee -a "$OUT/log"
  timeout "$t" env BENCH_SCALE=synth100m BENCH_RANK=128 \
    BENCH_LAYOUT_CACHE=/tmp/blc BENCH_ORACLE_ROWS=300 "$@" python bench.py \
    >"$OUT/$name.out" 2>"$OUT/$name.err"
  echo "rc=$? $(tail -c 300 "$OUT/$name.out")" | tee -a "$OUT/log"
}

# same layout, gather-budget ladder (cheap after the first build)
run base_g256 4800 BENCH_GATHER_MB=256
run g512 2400 BENCH_GATHER_MB=512
run g1024 2400 BENCH_GATHER_MB=1024
run g2048 2400 BENCH_GATHER_MB=2048
run g4096 2400 BENCH_GATHER_MB=4096
# layout-changing levers (each rebuilds + caches its layout)
run dmd1024 4800 BENCH_DMD=1024
run dmd4096 4800 BENCH_DMD=4096
run hot64 4800 BENCH_HOT_COLS=64
run growth112 4800 BENCH_GROWTH=1.12
echo "ALL DONE $(date)" | tee -a "$OUT/log"
