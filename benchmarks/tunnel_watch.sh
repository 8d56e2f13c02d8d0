#!/bin/bash
# Wait for the TPU tunnel to come back, then capture the queued experiments.
#
# The tunnel (axon plugin) goes fully unresponsive for hours at a time
# (ROADMAP.md round-3 outage log): even backend init hangs, so every probe
# and every experiment must be bounded by `timeout`. This watcher probes
# with a tiny matmul + D2H fetch (the only real fence, CLAUDE.md) every few
# minutes and, the moment a probe succeeds, runs the queued benchmark
# scripts back-to-back while the weather lasts, logging to .bench_cache/.
#
# Usage: bash benchmarks/tunnel_watch.sh   (intended to live in tmux)
set -u
cd "$(dirname "$0")/.."
LOG_DIR=.bench_cache
mkdir -p "$LOG_DIR"
STAMP=$(date +%Y%m%d_%H%M%S)
LOG="$LOG_DIR/queued_$STAMP.log"

probe() {
  timeout 240 python -c "
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
y = jax.jit(lambda a: a @ a)(x)
print('probe sum', float(np.asarray(jnp.sum(y))), flush=True)
" >/dev/null 2>&1
}

echo "[watch] started $(date -u +%FT%TZ), probing every 240s" | tee -a "$LOG"
until probe; do
  echo "[watch] tunnel still down $(date -u +%FT%TZ)" >>"$LOG"
  sleep 240
done
echo "[watch] TUNNEL UP $(date -u +%FT%TZ) — running queued experiments" | tee -a "$LOG"

run() { # run <timeout_s> <label> <cmd...>
  local t=$1 label=$2; shift 2
  echo "=== $label ($(date -u +%FT%TZ)) ===" | tee -a "$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  echo "--- $label exit=$? ($(date -u +%FT%TZ)) ---" | tee -a "$LOG"
}

run 900  int8_probe        python benchmarks/int8_probe.py
run 1800 int8_zone         python benchmarks/int8_zone.py
run 1800 zone_scan_unroll  python benchmarks/zone_scan_unroll.py
run 1500 train_split       python benchmarks/train_split.py
run 3000 remat_accum       python benchmarks/remat_accum.py
# warm the persistent XLA compile cache so the driver's end-of-round bench
# run pays no 20-40s compiles, and capture a fresh headline line
run 2400 bench_warm        python bench.py
touch "$LOG_DIR/QUEUED_DONE_$STAMP"
echo "[watch] all queued experiments done $(date -u +%FT%TZ)" | tee -a "$LOG"
