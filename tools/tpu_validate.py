"""Ground-truth validation + flagship timing of the fused pipeline on the real TPU.

Run directly (no PYTHONPATH override - that disables the TPU platform);
keep runs under ~9 minutes and never run two TPU processes at once (see
CLAUDE.md).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys, time, numpy as np, jax, jax.numpy as jnp
def log(*a): print(*a, file=sys.stderr, flush=True)
def sync(tree):
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    jax.block_until_ready(leaves)
    return float(np.asarray(jax.jit(lambda v: jnp.ravel(v)[:1].real.astype(jnp.float32))(leaves[0]))[0])
from sdr_channelizer_tpu.config import PdwConfig
from sdr_channelizer_tpu.models import ChannelizerPipeline
from sdr_channelizer_tpu.signal.synth import PulseTrainSpec, pulse_train, pulse_starts
log("devices:", jax.devices())

# Ground-truth validation on the fused path (f32 planes in, PDW out).
spec = PulseTrainSpec(sample_rate_sps=8e6, duration_sec=4e-3, frequency_hz=2.3e6,
                      pulse_width_sec=100e-6, pri_sec=500e-6, start_index=1234,
                      noise_std=3e-3)
iq = pulse_train(spec, seed=7)
n = len(iq) // 8 * 8
cfg = PdwConfig.channelized(max_pulses=32, max_pulse_samples=512)
pipe = ChannelizerPipeline.create(8, pdw_cfg=cfg)
t0 = time.perf_counter()
p = pipe.extract_fused(
    np.stack([np.real(iq[:n]), np.imag(iq[:n])], -1).astype(np.float32),
    bit_width=0, fs=8e6, sample_start_time=0.0)
log(f"fused extract (compile+run+fetch) {time.perf_counter()-t0:.1f}s, {len(p['toa'])} pdws")
strong = p["snr"] > 25
truth = len(pulse_starts(spec))
assert strong.sum() == truth, (strong.sum(), truth)
assert abs(np.median(p["pw"][strong]) - 100e-6) < 15e-6
assert np.all(np.abs(p["freq"][strong] - 2.3e6) < 0.5e6)
log("TPU FUSED PIPELINE: GROUND TRUTH OK")

# Throughput of the full fused pipeline at flagship scale.
n2 = 64 * 262144  # 16.7M samples
cfg2 = PdwConfig.channelized(max_pulses=512, max_pulse_samples=1024)
pipe2 = ChannelizerPipeline.create(64, pdw_cfg=cfg2)
rng = np.random.default_rng(0)
t = np.arange(n2)
sig = (0.001*(rng.standard_normal(n2)+1j*rng.standard_normal(n2))).astype(np.complex64)
tone = np.exp(2j*np.pi*1.3e6/64e6*t)
for s in range(137, n2-6400, 64000):
    sig[s:s+6400] = tone[s:s+6400]
xr = jax.device_put(np.real(sig).astype(np.float32).copy())
xi = jax.device_put(np.imag(sig).astype(np.float32).copy())
t0 = time.perf_counter()
out = pipe2.step_fused(xr, xi, bit_width=0)
sync(out)
log(f"flagship fused compile+first {time.perf_counter()-t0:.1f}s count={int(np.asarray(out[2].count).sum())}")
t0 = time.perf_counter(); sync(out); fence = time.perf_counter()-t0
iters = 10
t0 = time.perf_counter()
for _ in range(iters):
    out = pipe2.step_fused(xr, xi, bit_width=0)
sync(out)
dt = (time.perf_counter()-t0-fence)/iters
log(f"FLAGSHIP FUSED PIPELINE: {n2/dt/1e6:.0f} Msps/chip ({dt*1e3:.2f} ms/step)")
log("done")
