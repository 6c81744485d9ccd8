"""Profile the slow stats-stage variant (w0) with jax.profiler.

Captures a device trace of a few w0 iterations and prints the largest
device-time events from the xplane proto (parsed with the bundled
tensorboard/xplane schema if available, else raw-dumped for offline
inspection).  Single TPU process only.
"""
import glob
import os
import sys

sys.path.insert(1, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.tpu_glue_fix_probe_lib import build_w0_and_input  # noqa: E402

w0, xq = build_w0_and_input()
out = w0(xq)
float(np.asarray(jax.jit(lambda v: jnp.ravel(v)[:1])(out))[0])

with jax.profiler.trace("/tmp/w0_trace"):
    for _ in range(5):
        out = w0(xq)
    float(np.asarray(jax.jit(lambda v: jnp.ravel(v)[:1])(out))[0])

files = glob.glob("/tmp/w0_trace/**/*.xplane.pb", recursive=True)
print("trace files:", files)
for f in files:
    print(f, os.path.getsize(f), "bytes")
