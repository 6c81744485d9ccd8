"""Per-channel exact-median noise floor, VMEM-resident (one HBM read).

The reference's per-bin noise floor is the exact median magnitude over the
whole capture (``create_pdws_channelized.m:73``).  The XLA formulation
(``ops.medians`` bits=4 value-space descent) re-reads the (M, T) magnitude
stream from HBM once per radix level — 8 passes, ~0.6 ms of pure HBM at
the bench shape on top of the counting VPU work (PROBE_r04 B: 1.78 ms
marginal).  This kernel keeps each 8-channel row group RESIDENT in VMEM
for the whole descent, so HBM is touched once, and uses bits=2 levels
(3 absolute-range counts per level, 16 levels) — less counting work per
element than bits=4's 15 cuts since VMEM re-reads are free.

Exactness: identical order statistics to ``ops.medians.masked_median``
(absolute-range multibit descent + the lo/hi finish trick), so the result
is bit-identical to the XLA path.  Pad columns at/past ``t_len`` are
excluded by rewriting their keys to 0xFFFFFFFF (sorts above every real
value; the selected ranks are < t_len).

Mosaic notes: all arrays stay 2-D (8, T); per-channel radix state lives in
(8, 1) columns; level cuts derive from the prefix column with u32 shifts
(cut values broadcast along lanes).  Counts stay < 2^24 so f32 sums are
exact per block; T >= 2^24 callers belong in ``dsp.streaming``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdr_channelizer_tpu.ops.pallas.pulse_stats_kernel import (
    _f32_from_keys,
    _keys_from_f32,
)

# The descent holds ~5 (8, T_pad) f32/u32 arrays live (magnitude, keys,
# the per-cut compare, the min-above candidate, the validity mask) ≈
# 160 B per column under the kernel's 100 MB scoped-VMEM limit.  Gate the
# routing well under that so longer (still < 2^24) captures fall back to
# the XLA descent instead of failing the whole program's compile.
NF_KERNEL_MAX_T = 400_000


def nf_kernel_feasible(t_pad: int) -> bool:
    return t_pad <= NF_KERNEL_MAX_T


def _nf_kernel(mag_ref, out_ref, *, t_len: int, bits: int):
    mag = mag_ref[...]  # (8, T_pad)
    t_pad = mag.shape[1]
    keys = _keys_from_f32(mag)
    if t_pad != t_len or t_pad % 128:
        # mask both the caller's pad columns and any Mosaic lane padding
        lane = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)
        valid = lane < t_len
        keys = jnp.where(valid, keys, jnp.uint32(0xFFFFFFFF))
    else:
        valid = None

    k_lo = jnp.float32(max((t_len - 1) // 2, 0))
    k_hi = jnp.float32(max(t_len // 2, 0))

    def count_le(cut_col):  # (8, 1) u32 cuts -> (8, 1) f32 counts
        return jnp.sum((keys <= cut_col).astype(jnp.float32),
                       axis=1, keepdims=True)

    prefix = jnp.zeros((8, 1), jnp.uint32)
    for level in range(32 // bits):
        shift = jnp.uint32(32 - bits * (level + 1))
        nib = jnp.zeros((8, 1), jnp.float32)
        for j in range(1, 1 << bits):
            cut = (prefix | (jnp.uint32(j) << shift)) - jnp.uint32(1)
            nib = nib + (count_le(cut) <= k_lo).astype(jnp.float32)
        # exact small integers; Mosaic has no f32->u32 convert — go
        # through i32 then bitcast (values 0..2^bits-1, exact)
        nib_u = pltpu.bitcast(nib.astype(jnp.int32), jnp.uint32)
        prefix = prefix | (nib_u << shift)

    # lo value from the selected key; hi via the finish trick.
    lo = _f32_from_keys(prefix)  # (8, 1)
    cnt_le = count_le(prefix)
    big = jnp.float32(3.0e38)
    above = keys > prefix
    if valid is not None:
        above = above & valid  # pad keys are FFFF: exclude their mag=0
    cand = jnp.where(above, mag, big)
    nxt = jnp.min(cand, axis=1, keepdims=True)
    hi = jnp.where(cnt_le > k_hi, lo, nxt)
    med = 0.5 * (lo + hi)
    out_ref[...] = jnp.broadcast_to(med, (8, 128))


@functools.partial(jax.jit, static_argnames=("t_len", "bits", "interpret"))
def pallas_noise_floor_cm(
    mag_cm: jax.Array,  # (R, T_pad) f32 channel-major magnitude (R % 8 == 0)
    *,
    t_len: int,
    bits: int = 2,
    interpret: bool = False,
) -> jax.Array:
    """Exact per-channel median magnitude, one HBM read.  Returns (R,).

    Callers slice to the real channel count (pad rows are all-zero and
    yield median 0, unused)."""
    interpret = interpret or jax.devices()[0].platform == "cpu"
    r, t_pad = mag_cm.shape
    assert r % 8 == 0 and t_len <= t_pad and nf_kernel_feasible(t_pad)
    kernel = functools.partial(_nf_kernel, t_len=t_len, bits=bits)
    out = pl.pallas_call(
        kernel,
        grid=(r // 8,),
        in_specs=[pl.BlockSpec((8, t_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(mag_cm)
    return out[:, 0]
