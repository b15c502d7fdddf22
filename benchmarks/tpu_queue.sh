#!/bin/bash
# Queued real-TPU work for when the axon tunnel returns (BENCH_LOCAL.md
# provenance notes). Run ONE at a time (never two TPU processes), each under
# a generous timeout — remote compiles can take 5-10+ min on a cache miss;
# the persistent cache makes retries fast.
#
#   bash benchmarks/tpu_queue.sh [logdir]
#
# Probe first: `timeout 90 python -c "import jax; print(jax.devices())"`
# — if it hangs, the remote pool is down; do NOT start the queue.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_queue}"
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0

run() {
  name="$1"; shift
  echo "=== $name ==="
  timeout 2400 "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  tail -3 "$LOG/$name.log"
  echo "--- $name exit $rc"
}

# 1. correctness FIRST: the compiled-Mosaic sweep (weighted + box + fddp +
#    streamed-fddp blocks). Nothing below is trustworthy if this fails.
run validate python benchmarks/tpu_validate.py

# 2. headline driver bench (unchanged protocol — regression check)
run bench python bench.py

# 3. robust-mode throughput (FDDP kernel vs exact loop, aggressive class)
run fddp_bench python benchmarks/fddp_bench.py

# 4. second model family regression
run wrench_bench python benchmarks/wrench_bench.py

# 5. speed-of-light accounting (now includes the fddp sub-report)
run roofline python benchmarks/roofline.py

# 6. the five BASELINE configs (quick mode for a regression pass)
run run_all python benchmarks/run_all.py --quick

echo "ALL DONE — update BENCH_LOCAL.md from $LOG/*.log"
