#!/bin/bash
# Round-5 serial TPU campaign (single-client tunnel: ONE process at a time).
# Phase-gated: probe the kernel A/Bs first; later steps assume the winning
# defaults are already committed.  Each step under its own timeout with
# settle gaps; a failed step gets a long settle (tunnel wedge).
#
# Usage: nohup bash tools/tpu_session_r5.sh [phase] > /tmp/tpu_r5.log 2>&1 &
#   phase "probe"  : parts A+B of tpu_probe_r5 (the kernel A/B decision)
#   phase "sweep"  : parts C+D (batch_tiles / nf bits sweeps)
#   phase "bench"  : bench.py + tpu_ksweep (the agreement artifact)
#   phase "apps"   : m560 + stream + tracker scenes + validate
set -u
cd "$(dirname "$0")/.."
PHASE="${1:-probe}"
LOG() { echo "[tpu_r5 $(date -u +%H:%M:%S)] $*"; }

probe_tunnel() {
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

ok=0
for i in $(seq 1 8); do
  LOG "tunnel probe attempt $i"
  if probe_tunnel; then ok=1; break; fi
  LOG "probe failed; backing off 8 min"
  sleep 480
done
if [ "$ok" != 1 ]; then LOG "tunnel never came back; giving up"; exit 1; fi
sleep 30

run_step() {
  local name="$1" tmo="$2"; shift 2
  LOG "=== $name ==="
  timeout "$tmo" "$@"
  local rc=$?
  LOG "=== $name done rc=$rc ==="
  if [ "$rc" != 0 ]; then sleep 300; else sleep 45; fi
  return $rc
}

case "$PHASE" in
probe)
  PROBE_PARTS=AB run_step probe_r5_ab 4200 python tools/tpu_probe_r5.py
  ;;
sweep)
  PROBE_PARTS=E run_step probe_r5_e 3000 python tools/tpu_probe_r5.py
  PROBE_PARTS=D run_step probe_r5_d 1800 python tools/tpu_probe_r5.py
  ;;
bench)
  run_step bench 3000 python bench.py
  run_step ksweep 2400 python tools/tpu_ksweep.py
  ;;
apps)
  M560_PARTS=OP,KNOBS run_step m560 3600 python tools/tpu_m560.py
  run_step stream_r5 2400 python tools/tpu_stream_r5.py
  TRACKER_SCENE=dense run_step tracker_dense 1500 python tools/tpu_tracker_drive.py
  TRACKER_SCENE=sat run_step tracker_sat 1500 python tools/tpu_tracker_drive.py
  TRACKER_SCENE=two run_step tracker_two 1500 python tools/tpu_tracker_drive.py
  TRACKER_SCENE=dense TRACKER_FS=224e6 run_step tracker_dense_224 1500 \
    python tools/tpu_tracker_drive.py
  run_step validate 1800 python tools/tpu_validate.py
  ;;
*)
  LOG "unknown phase $PHASE"; exit 1 ;;
esac
LOG "phase $PHASE complete"
