"""One-off: in-graph time of the CURRENT package full packed step.

Reuses tpu_probe_r3's harness (same workload, same protocol) but times
``pipe.forward_packed`` as imported from the package — i.e. whatever tail
formulation is checked out.  Compare against PROBE_r03.json B_c8_full_ms.
"""
from tpu_probe_r3 import full_scalar, graph_time, log, xq  # noqa: E402

if __name__ == "__main__":
    # Guarded: importing this module must not start a TPU run (the tunnel
    # is single-client; an accidental import would wedge it).
    dt = graph_time("full_current_package", full_scalar, xq)
    log(f"RESULT full step {dt*1e3:.3f} ms = "
        f"{64 * 262144 / dt / 1e9:.2f} Gsps")
