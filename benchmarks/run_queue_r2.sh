#!/bin/bash
# Round-2 TPU validation queue: run when the relay returns.
# Usage: bash benchmarks/run_queue_r2.sh [logfile]
set -u
LOG="${1:-/tmp/queue_r2.log}"
cd "$(dirname "$0")/.."
{
  echo "=== queue start $(date) ==="
  echo "--- vote: windowed vs plane-splat (bench_vote3) ---"
  timeout 900 python benchmarks/bench_vote3.py 2>&1 | grep -v "cpu_aot\|Machine\|features"
  echo "--- vote knobs (bench_vote2) ---"
  timeout 900 python benchmarks/bench_vote2.py 2>&1 | grep -v "cpu_aot\|Machine\|features"
  echo "--- stem compact vs prefold (bench_stem2) ---"
  timeout 900 python benchmarks/bench_stem2.py 2>&1 | grep -v "cpu_aot\|Machine\|features"
  echo "--- int8 MXU primitive (bench_int8) ---"
  timeout 600 python benchmarks/bench_int8.py 2>&1 | grep -v "cpu_aot\|Machine\|features"
  echo "--- e2e bench ---"
  timeout 1200 python bench.py 2>&1 | grep -v "cpu_aot\|Machine\|features"
  echo "--- e2e bench (9-model separate) ---"
  timeout 1800 python bench.py --separate 2>&1 | grep -v "cpu_aot\|Machine\|features"
  echo "=== queue end $(date) ==="
} >> "$LOG" 2>&1
