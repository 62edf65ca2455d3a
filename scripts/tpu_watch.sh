#!/bin/bash
# Poll the TPU tunnel; when a device query succeeds, fire the round-3
# measurement battery (scripts/round3_measure.sh). Designed to run inside
# tmux and survive the tunnel being down for hours.
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout 300 python - <<'EOF' 2>/dev/null
import jax
d = jax.devices()
assert d and d[0].platform == "tpu", d
print("TPU_UP", d)
EOF
}

n=0
while true; do
  n=$((n + 1))
  echo "[tpu_watch] probe $n at $(date +%T)"
  if probe; then
    echo "[tpu_watch] TPU is up — firing round3_measure.sh at $(date +%T)"
    bash scripts/round3_measure.sh
    echo "[tpu_watch] battery done at $(date +%T)"
    break
  fi
  sleep 180
done
