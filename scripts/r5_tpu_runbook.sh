#!/bin/bash
# Round-5 TPU measurement sequence (run when the axon tunnel is up).
# Writes all outputs under docs/measurements/r5/ (committed — VERDICT r4
# provenance finding: raw artifacts must live in-repo, not /tmp).
#
# Refuses to TIME under load (VERDICT r4 weak #2: several r4 rows were
# measured while the test suite ran and carried a contention caveat):
# each timed step first asserts 1-min loadavg < MAX_LOAD (default 4 — the
# host has many cores, but the oracle rows/s and small-epoch numbers are
# host-latency-sensitive well below saturation).
set -u
OUT=${OUT:-/root/repo/docs/measurements/r5}
MAX_LOAD=${MAX_LOAD:-4}
mkdir -p "$OUT"
cd /root/repo

idle_or_die() {
  local load
  load=$(cut -d' ' -f1 /proc/loadavg)
  if python3 -c "import sys; sys.exit(0 if float('$load') < float('$MAX_LOAD') else 1)"; then
    return 0
  fi
  echo "REFUSING to time under load: 1-min loadavg $load >= $MAX_LOAD" | tee -a "$OUT/log"
  exit 2
}

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  idle_or_die
  echo "=== $name ($(date +%H:%M:%S), load $(cut -d' ' -f1 /proc/loadavg)) ===" | tee -a "$OUT/log"
  timeout "$t" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  echo "rc=$? $(tail -c 300 "$OUT/$name.out")" | tee -a "$OUT/log"
}

# 1. warm the Mosaic compile service + headline rank-64
run bench_r64 2400 env BENCH_SCALE=ml25m BENCH_RANK=64 python bench.py
# 2. implicit rank-64 + rank-128
run bench_r64_imp 1200 env BENCH_SCALE=ml25m BENCH_RANK=64 BENCH_ALPHA=40 python bench.py
run bench_r128 1800 env BENCH_SCALE=ml25m BENCH_RANK=128 python bench.py
# 3. ML-1M configs — r4 measured these under pytest contention; this
#    sitting re-takes them idle (the run() guard enforces it)
run bench_ml1m 900 env BENCH_SCALE=ml1m BENCH_RANK=64 python bench.py
run bench_ml1m_imp 900 env BENCH_SCALE=ml1m BENCH_RANK=64 BENCH_ALPHA=40 python bench.py
# 4. IMC — fit_seconds now amortized over 5 fits under one fence
run bench_imc 1200 env BENCH_SCALE=ml1m BENCH_MODE=imc BENCH_RANK=16 python bench.py
# 5. serving (permuted catalogs: recall@10 should equal recall_at_10_exact)
run bench_serving 1800 env BENCH_SCALE=ml25m BENCH_MODE=serving python bench.py
# 6. the two r4 rows whose first-sitting runs recorded rc=1 (fixed in
#    707d956): re-run so the quoted numbers have in-repo raw outputs
run dma_probe 900 python scripts/probe_dma_gather.py
run sharded_scan_ml1m 900 env SCALE=ml1m RANK=64 SWEEPS=20 SHARDS=1 python scripts/measure_sharded_scan.py
# 7. production-config sharded scan (1-shard parity row)
run sharded_scan_prod 1800 env SCALE=ml25m RANK=64 SWEEPS=10 SHARDS=1 FASTPATHS=1 python scripts/measure_sharded_scan.py
# 8. synth100m rank-64 (layout cache reused across rounds)
run bench_100m 3600 env BENCH_SCALE=synth100m BENCH_RANK=64 BENCH_LAYOUT_CACHE=/tmp/blc python bench.py
echo "ALL DONE $(date)" | tee -a "$OUT/log"
