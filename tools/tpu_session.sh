#!/bin/bash
# Serial TPU validation session (single-client tunnel: ONE process at a time,
# see CLAUDE.md).  Waits for the tunnel to come back with a cheap probe +
# backoff, then runs the pending round-2 validation list in order, each step
# under its own timeout, with settle gaps between steps.
#
# Usage: nohup bash tools/tpu_session.sh > /tmp/tpu_session.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
LOG() { echo "[tpu_session $(date -u +%H:%M:%S)] $*"; }

probe() {
  timeout 420 python -c "
import time, jax
t0 = time.time()
d = jax.devices()
import jax.numpy as jnp
x = jnp.ones((8, 128), jnp.float32)
print('probe ok:', d[0].platform, d[0].device_kind,
      'init %.0fs' % (time.time() - t0), 'sum', float(x.sum()))
"
}

# Phase 1: wait for the tunnel (up to ~2.5 h of retries).
ok=0
for i in $(seq 1 12); do
  LOG "probe attempt $i"
  if probe; then ok=1; break; fi
  LOG "probe failed; backing off 10 min"
  sleep 600
done
if [ "$ok" != 1 ]; then LOG "tunnel never came back; giving up"; exit 1; fi
sleep 60

# Phase 2: serial validation list (STATUS.md gap 1).
run_step() {
  local name="$1" tmo="$2"; shift 2
  LOG "=== $name ==="
  timeout "$tmo" "$@"
  local rc=$?
  LOG "=== $name done rc=$rc ==="
  # settle gap so a crashed step's wedge has time to clear
  if [ "$rc" != 0 ]; then sleep 300; else sleep 45; fi
  return $rc
}

run_step validate      900 python tools/tpu_validate.py
run_step bisect        900 python tools/tpu_bisect.py
run_step bisect_stats  900 python tools/tpu_bisect_stats.py
run_step profile_r2    900 python tools/tpu_profile_r2.py
run_step bench         3000 python bench.py
LOG "session complete"
