#!/bin/bash
# Sequential f32-collapse ablation matrix (VERDICT round-1 #1).
# Each run prints its config then the converged count. CPU-only.
set -u
export PYTHONPATH="/root/repo:/root/.axon_site"
cd /root/repo
run() {
  echo "=== $* ==="
  timeout 2400 python scripts/repro_f32.py --B 16 "$@" 2>&1 | tail -4
}
run --kim 1e-2
run --no-ws
run --kim 1e-2 --no-ws
run --f64
run --kappa-eval 1e-4 --kim 1e-2
