#!/bin/bash
# Round-4 TPU measurement sequence (run when the axon tunnel is up).
# Writes all outputs under /tmp/r4_measurements/.
set -u
OUT=/tmp/r4_measurements
mkdir -p $OUT
cd /root/repo

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a $OUT/log
  timeout "$t" "$@" >$OUT/$name.out 2>$OUT/$name.err
  echo "rc=$? $(tail -c 300 $OUT/$name.out)" | tee -a $OUT/log
}

# 1. warm the Mosaic compile service + confirm rank-64 headline
run bench_r64 2400 env BENCH_SCALE=ml25m BENCH_RANK=64 python bench.py
# 2. implicit rank-64
run bench_r64_imp 1200 env BENCH_SCALE=ml25m BENCH_RANK=64 BENCH_ALPHA=40 python bench.py
# 3. rank-128
run bench_r128 1800 env BENCH_SCALE=ml25m BENCH_RANK=128 python bench.py
# 3b. sharded+hot+pallas vma smoke (r4 fix validation)
run sharded_hot 900 python scripts/smoke_sharded_hot_tpu.py
# 4. DMA gather probe (ledger)
run dma_probe 900 python scripts/probe_dma_gather.py
# 5. scanned sharded fit delta, 1-shard real mesh
run sharded_scan_ml1m 900 env SCALE=ml1m RANK=64 SWEEPS=20 SHARDS=1 python scripts/measure_sharded_scan.py
run sharded_scan_ml25m 1800 env SCALE=ml25m RANK=64 SWEEPS=10 SHARDS=1 python scripts/measure_sharded_scan.py
# 6. ML-1M configs
run bench_ml1m 900 env BENCH_SCALE=ml1m BENCH_RANK=64 python bench.py
run bench_ml1m_imp 900 env BENCH_SCALE=ml1m BENCH_RANK=64 BENCH_ALPHA=40 python bench.py
# 7. serving + imc
run bench_serving 1800 env BENCH_SCALE=ml25m BENCH_MODE=serving python bench.py
run bench_imc 1200 env BENCH_SCALE=ml1m BENCH_MODE=imc BENCH_RANK=16 python bench.py
# 8. synth100m rank 64 (longest: host layout build is minutes; cache it)
run bench_100m 3600 env BENCH_SCALE=synth100m BENCH_RANK=64 BENCH_LAYOUT_CACHE=/tmp/blc python bench.py
echo "ALL DONE $(date)" | tee -a $OUT/log
