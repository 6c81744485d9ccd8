"""Feasibility: in-kernel DMA of a lane slice from an ANY-space i32 array
into SMEM scratch, then scalar reads off it (drives the pulse_stats
prefetch-bypass redesign).  Compile + correctness check on the real TPU.
"""
import os
import sys
import functools

sys.path.insert(1, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(data_hbm, out_ref, smem, sem):
    def body(j, carry):
        cp = pltpu.make_async_copy(
            data_hbm.at[:, pl.ds(j * 128, 128)], smem, sem)
        cp.start()
        cp.wait()
        # scalar reads + arithmetic off SMEM
        v0 = smem[0, 0]
        v5 = smem[0, 5]
        toa = v5 & 0xFFFFFF
        ch = v5 >> 24
        out_ref[pl.ds(0, 8), pl.ds(j * 128, 128)] = (
            jnp.full((8, 128), 1.0, jnp.float32)
            * (v0 + toa + ch).astype(jnp.float32))
        return carry

    jax.lax.fori_loop(0, 4, body, jnp.int32(0))


@jax.jit
def run(data):
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
        scratch_shapes=[pltpu.SMEM((8, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )(data)


rng = np.random.default_rng(0)
data = rng.integers(0, 1 << 30, size=(8, 512), dtype=np.int32)
# row-replicate so any sublane read agrees
data = np.broadcast_to(data[0:1], (8, 512)).copy()
out = np.asarray(run(jnp.asarray(data)))
want = np.zeros((8, 512), np.float32)
for j in range(4):
    v0 = data[0, j * 128 + 0]
    v5 = data[0, j * 128 + 5]
    want[:, j * 128:(j + 1) * 128] = float(v0 + (v5 & 0xFFFFFF) + (v5 >> 24))
np.testing.assert_allclose(out, want, rtol=1e-6)
print("SMEM DMA + scalar reads OK")
