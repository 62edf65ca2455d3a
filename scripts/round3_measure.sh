#!/bin/bash
# Round-3 measurement battery — run when the TPU tunnel is back.
# Each stage is independently timeout-guarded and logs to /tmp/r3_*.log;
# artifacts land at the repo root. Order: cheap/cache-warming first, the
# 25-minute soak last. Every stage is kill-safe (direct child PIDs only).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
# `python scripts/x.py` puts scripts/ (not the repo root) on sys.path
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

run() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%T)) ==="
  timeout "$tmo" "$@" >"/tmp/r3_${name}.log" 2>&1
  local rc=$?
  tail -3 "/tmp/r3_${name}.log" | sed 's/^/    /'
  echo "--- $name: rc=$rc"
}

# 1. headline bench: FAST + strict SECURITY_128_BIT, warms the driver cache
run bench 3000 python bench.py

# 2. production golden vectors (also full-stack validation, ~5 min warm)
run golden 3000 python scripts/tpu_validation.py --write-golden

# 3. per-op suite refresh (UINT4 now rides the wide kernel; keygen_warm)
run suite 3600 python scripts/bench_suite.py

# 4. small-kernel A/B at B=1..8 (fused_small vs auto) — flips the heuristic.
#    Also at strict SECURITY_128_BIT: its 2L=6 digit planes make the
#    commuted (digit-circulant) build cheapest exactly where the
#    apples-to-apples latency row needs it.
run smallab 1200 python scripts/bench_small_kernel.py
run smallab_strict 1200 env RS_TFHE_BENCH_PARAMS=SECURITY_128_BIT python scripts/bench_small_kernel.py

# 5. Mosaic capability probe (s16 dots / int8 rolls — Nussbaumer-in-VMEM gate)
run mosaic 600 python scripts/probe_mosaic.py

# 6. cold-keygen diagnosis (VERDICT r2 weak #1): fused vs split, fresh cache
run keygen_fused 1200 python scripts/diag_keygen.py fused
run keygen_split 1200 python scripts/diag_keygen.py split

# 7. reliability soak (~25 min) — writes SOAK_r03.json incrementally
run soak 3900 python scripts/soak.py

echo "ALL STAGES DONE $(date +%T)"
