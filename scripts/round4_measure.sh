#!/bin/bash
# Round-4 measurement battery — refreshes every hardware artifact after the
# routing/robustness changes. Each stage is independently timeout-guarded
# and logs to /tmp/r4_*.log; artifacts land at the repo root. Order:
# cheap/cache-warming first, the ~35-minute soak last. Every stage is
# kill-safe (direct child PIDs only; never kill by pattern).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
# `python scripts/x.py` puts scripts/ (not the repo root) on sys.path
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

run() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%T)) ==="
  timeout "$tmo" "$@" >"/tmp/r4_${name}.log" 2>&1
  local rc=$?
  tail -3 "/tmp/r4_${name}.log" | sed 's/^/    /'
  echo "--- $name: rc=$rc"
}

# 1. headline bench (now prewarm-guarded): FAST + strict SECURITY_128_BIT
run bench 3600 python bench.py

# 2. golden vectors still bit-exact at production shapes (the routing
#    change swaps bit-exact kernels, so this must pass unchanged)
run golden 3000 python scripts/tpu_validation.py

# 3. per-op suite refresh (strict rows ride the per-tile kernel now)
run suite 4200 python scripts/bench_suite.py

# 4. Mosaic capability probe (s16 dots / int8 rolls — re-test each release)
run mosaic 600 python scripts/probe_mosaic.py

# 5. reliability soak (~35 min): 10M FAST + 2M strict + 10k nibble adds,
#    writes SOAK_r04.json incrementally
run soak 5400 python scripts/soak.py

echo "ALL STAGES DONE $(date +%T)"
