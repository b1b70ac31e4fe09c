#!/bin/bash
# One-shot TPU measurement sweep for round-2 changes.  Run on the TPU
# attach; each step tees into /tmp/bench_logs/.  Order matters: validity
# checks first (smoke + kernel crosschecks), then throughput.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/bench_logs

run() {
  name=$1; shift
  echo "=== $name ==="
  timeout 1800 "$@" 2>&1 | tee "/tmp/bench_logs/$name.log" | tail -25
}

run tpu_smoke      python benchmarks/tpu_smoke.py
run crosscheck     python benchmarks/intersect_crosscheck.py
run bm25           python benchmarks/bm25_bench.py
run filtered_knn   python benchmarks/filtered_knn_bench.py
run agg            python benchmarks/agg_bench.py
run ann_sweep      python benchmarks/ann_sweep.py
run cold           python benchmarks/cold_bench.py
run bench_headline python bench.py
echo "=== done; logs in /tmp/bench_logs ==="
