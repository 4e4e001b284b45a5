"""Reproduce the three host->device transfer pathologies (2026-08-17).

Run on the target host: ``python scripts/probe_transfer.py``. Each probe
prints measured rates; the fixes live in efficientat_tpu/utils/host.py
(THP) and efficientat_tpu/data/staging.py (staging pool + sync mode).

Measured on this machine (1-vCPU VM, remote TPU v5e over the axon relay):

1. THP first-touch. Faulting a fresh 154 MB numpy buffer: 7.3 s with
   transparent huge pages vs 0.08 s after prctl(PR_SET_THP_DISABLE).
   The VM's lazily-backed guest RAM pulls each 2 MB huge page through
   the backend synchronously; 4 KB faults are fine.

2. Post-execution transfer degradation. device_put of a warm 154 MB
   buffer: ~1.8 GB/s while the process has never executed a program,
   ~20-60 MB/s after ANY jit execution — persistently (sleeping between
   the execution and the put does not recover; buffer count does not
   matter, bytes do). This is a runtime/tunnel defect, not host-side;
   int16 transport (data/hdf5.py int16_waves) halves the bytes.

3. put-during-execution stall. A device_put issued while an execution is
   in flight can stall several seconds beyond (2); serializing
   put -> dispatch -> block restores the (already degraded) rate.
   data/staging.py::sync_transfer_mode gates this.

DANGER: do NOT issue concurrent device_puts from multiple threads on the
axon runtime — observed to wedge the remote worker (device unreachable
for tens of minutes).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    import jax
    import jax.numpy as jnp

    from efficientat_tpu.utils.host import disable_thp_first_touch

    thp_arg = "--thp" not in sys.argv
    if thp_arg:
        print("thp disabled:", disable_thp_first_touch())
    B, S = 120, 320000

    # 1. first-touch of a fresh large buffer
    for i in range(3):
        t0 = time.perf_counter()
        x = np.empty((B, S), np.float32)
        x.fill(0.1)
        print(f"fresh 154MB alloc+fill #{i}: {time.perf_counter()-t0:.3f}s",
              flush=True)
        del x

    # 2. transfer rate before any execution
    buf = np.full((B, S), 0.1, np.float32)
    jax.block_until_ready(jax.device_put(buf))  # warm dest + pages
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(buf))
    pre = buf.nbytes / 1e6 / (time.perf_counter() - t0)
    print(f"put before first execution: {pre:.0f} MB/s", flush=True)

    # ... and after one tiny execution
    f = jax.jit(lambda x: jnp.tanh(x @ x).sum())
    float(f(jax.device_put(np.ones((256, 256), np.float32))))
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(buf))
    post = buf.nbytes / 1e6 / (time.perf_counter() - t0)
    print(f"put after one execution:   {post:.0f} MB/s "
          f"({pre / max(post, 1e-9):.0f}x degradation)", flush=True)


if __name__ == "__main__":
    main()
