"""Re-measure the int8 packed operating point with an 8-bit-appropriate
capture, and record detected pulse counts for both widths.

The round-4 validate artifact's first int8 timing reused the bench capture whose noise
floor (1e-3) sits BELOW the int8 LSB (1/128 = 7.8e-3): quantized to 8
bits most noise samples collapse to 0, the per-channel median floor goes
degenerate, and the detector saturates on quantization transients — a
workload artifact that made int8 look 2x slower than int16.  This probe
uses noise ~2.5 LSB (0.02) so both widths run the same detection regime,
times BOTH widths on the SAME capture, and records pulse counts so the
comparison is auditable.  Updates VALIDATE_r05.json in place
(m64_int8_vs_int16 entry).  Single TPU process only.
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


def fetch_scalar(x):
    leaf = [v for v in jax.tree.leaves(x) if hasattr(v, "dtype")][0]
    return float(np.asarray(jax.jit(
        lambda v: jnp.ravel(v)[:1].astype(jnp.float32))(leaf))[0])


def graph_time(name, fn, *args, iters=60, reps=2):
    """bench.py's corrected protocol (distinct K, geometric pilot, ~8 s
    dispatch budget, median)."""
    @jax.jit
    def run(K, *a):
        def body(i, acc):
            salt = jnp.isnan(acc).astype(jnp.int32) + i * 0
            q = a[0].at[0].set(a[0][0] ^ salt.astype(a[0].dtype))
            return acc * 0.5 + fn(q, *a[1:])

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    def dispatch(k):
        t0 = time.perf_counter()
        fetch_scalar(run(k, *args))
        return time.perf_counter() - t0

    fetch_scalar(run(3, *args))
    t_floor = dispatch(4)
    pk = max(8, iters // 4)
    t_pilot = dispatch(pk)
    while t_pilot < 1.6 * t_floor and pk < 4000:
        pk *= 2
        t_pilot = dispatch(pk)
    s_pilot = t_pilot / pk
    budget = max(int(8.0 / s_pilot), 8)
    k1 = min(max(8, int(2.5 * t_floor / s_pilot) + 1), budget)
    span = min(max(iters, int(1.2 / s_pilot) + 1), budget, 4000)
    ests = []
    for r in range(reps):
        t1 = dispatch(k1 + r)
        t2 = dispatch(k1 + span + r)
        ests.append(max(t2 - t1, 1e-9) / span)
    dt = float(np.median(ests))
    log(f"{name:<26s} {dt*1e3:9.3f} ms/iter (K1={k1}, span={span})")
    return dt


def main():
    from sdr_channelizer_tpu.config import PdwConfig
    from sdr_channelizer_tpu.io import iqpacket
    from sdr_channelizer_tpu.models import ChannelizerPipeline
    from bench import _make_capture

    dev = jax.devices()[0]
    log("device:", dev.platform, dev.device_kind)
    BANDS, FRAMES = 64, 262144
    N = BANDS * FRAMES
    rng = np.random.default_rng(5)
    cap = _make_capture(N, BANDS)
    # Raise the noise floor to ~2.5 int8 LSBs so the 8-bit quantization
    # keeps a sane per-channel median floor.
    cap = (cap + 0.019 * (rng.standard_normal(N)
                          + 1j * rng.standard_normal(N))).astype(np.complex64)

    pipe = ChannelizerPipeline.create(
        BANDS, pdw_cfg=PdwConfig.channelized(max_pulses=512,
                                             max_pulse_samples=1024))

    def touch_counts(nf, batch):
        tot = (jnp.sum(nf) + jnp.sum(batch.mag) + jnp.sum(batch.snr_db)
               + jnp.sum(batch.toa_idx.astype(jnp.float32)))
        return tot

    entry = {}
    for bw, view in ((8, np.int16), (12, np.int32)):
        samples = np.ascontiguousarray(iqpacket.from_complex(cap, bw))
        q = jax.device_put(samples.view(view).ravel(), dev)

        def fwd(x, bw=bw):
            nf, _, batch = pipe.forward_packed(x, bit_width=bw)
            return touch_counts(nf, batch)

        # pulse count for auditability
        _, _, batch = pipe._jit_forward_packed(q, bit_width=bw)
        count = int(np.asarray(jax.jit(
            lambda b: jnp.sum(b.count).astype(jnp.float32))(batch)))
        dt = graph_time(f"int{bw}_packed", fwd, q)
        entry[f"int{bw}"] = {"ms_per_step": round(dt * 1e3, 2),
                             "msps": round(N / dt / 1e6, 1),
                             "pulses_per_step": count}
        log(f"int{bw}: {count} pulses")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "VALIDATE_r05.json")
    d = json.load(open(path))
    d["m64_int8_vs_int16_same_capture"] = {
        "noise_floor": "0.019 (~2.5 int8 LSB; the earlier int8 timing "
                       "reused the bench capture whose 1e-3 noise is "
                       "below the int8 LSB — degenerate detection regime)",
        "samples": N,
        **entry,
    }
    json.dump(d, open(path, "w"), indent=1, sort_keys=True)
    log("updated VALIDATE_r05.json")


if __name__ == "__main__":
    main()
