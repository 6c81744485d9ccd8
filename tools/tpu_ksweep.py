"""Decisive per-step calibration: wall time of ONE dispatch running K
in-graph iterations, swept over many DISTINCT K values, slope = per-step.

Every dispatch is unique (different K), so the transport's
identical-dispatch elision cannot fire; the least-squares slope over K
removes the per-dispatch fence/dispatch constant without differencing two
noisy readings.  Residuals around the fit quantify the jitter band.

Writes KSWEEP_r04.json with slopes for the dense and sparse bench payloads.
"""
import json
import os
import sys
import time

sys.path.insert(1, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


from bench import _make_capture, _quantize
from sdr_channelizer_tpu.config import PdwConfig
from sdr_channelizer_tpu.models.pipeline import ChannelizerPipeline
from sdr_channelizer_tpu.utils.profiling import sync_device

log("devices:", jax.devices())
BANDS, FRAMES = 64, 262144
N = BANDS * FRAMES
pipe = ChannelizerPipeline.create(
    BANDS, pdw_cfg=PdwConfig.channelized(max_pulses=512,
                                         max_pulse_samples=1024))
dev = jax.devices()[0]
payloads = {
    "dense": jax.device_put(np.ascontiguousarray(
        _quantize(_make_capture(N, BANDS))).view(np.int32).ravel(), dev),
    "sparse": jax.device_put(np.ascontiguousarray(
        _quantize(_make_capture(N, BANDS, sparse=True))
    ).view(np.int32).ravel(), dev),
}


@jax.jit
def run(K, q):
    def body(_, carry):
        salt = jnp.isnan(carry).astype(jnp.int32)
        nf, _, batch = pipe.forward_packed(q.at[0].set(q[0] ^ salt),
                                           bit_width=12)
        tot = (jnp.sum(nf) + jnp.sum(batch.mag) + jnp.sum(batch.snr_db)
               + jnp.sum(batch.toa_idx.astype(jnp.float32)))
        return carry * 0.5 + tot

    return jax.lax.fori_loop(0, K, body, jnp.float32(0))


results = {}
ks = [5, 15, 25, 45, 65, 85, 105, 125, 10, 35, 55, 95]
for name, q in payloads.items():
    sync_device(run(3, q))  # compile + warm
    rows = []
    for K in ks:
        t0 = time.perf_counter()
        sync_device(run(K, q))
        wall = time.perf_counter() - t0
        rows.append((K, wall))
        log(f"{name}: K={K:4d}  wall={wall*1e3:8.1f} ms")
    karr = np.array([r[0] for r in rows], float)
    warr = np.array([r[1] for r in rows], float)
    slope, intercept = np.polyfit(karr, warr, 1)
    resid = warr - (slope * karr + intercept)
    results[name] = {
        "per_step_ms": round(slope * 1e3, 3),
        "intercept_ms": round(intercept * 1e3, 1),
        "resid_rms_ms": round(float(np.sqrt(np.mean(resid ** 2))) * 1e3, 1),
        "points": [[int(k), round(w * 1e3, 1)] for k, w in rows],
    }
    log(f"{name}: slope {slope*1e3:.3f} ms/step, intercept "
        f"{intercept*1e3:.0f} ms, resid rms {np.sqrt(np.mean(resid**2))*1e3:.1f} ms")

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
with open(os.path.join(repo, "KSWEEP_r04.json"), "w") as f:
    json.dump({"shape": {"bands": BANDS, "frames": FRAMES},
               "results": results}, f, indent=1, sort_keys=True)
log("wrote KSWEEP_r04.json")
