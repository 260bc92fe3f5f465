"""Quick chip-health probe: backend init (deadline-armed) + HBM alloc
ladder + a tiny matmul timing. Safe to run standalone; exits 3 if the
tunnel hangs on backend init (CLAUDE.md round-3 outage mode)."""
import os
import sys
import threading
import time

import numpy as np


def main():
    deadline = threading.Timer(600.0, lambda: os._exit(3))
    deadline.daemon = True
    deadline.start()
    import jax
    import jax.numpy as jnp
    t0 = time.time()
    devs = jax.devices()
    print(f"devices: {devs} (init {time.time() - t0:.1f}s)", flush=True)
    deadline.cancel()

    free = 0.0
    for gb in (8.0, 6.0, 4.0, 2.0, 1.0, 0.5):
        guard = threading.Timer(180.0, lambda: os._exit(4))
        guard.daemon = True
        guard.start()
        try:
            n = int(gb * (1 << 30) / 2)
            x = jax.jit(lambda: jnp.zeros((n,), jnp.bfloat16))()
            np.asarray(x.ravel()[:1])
            free = gb
            del x
            guard.cancel()
            break
        except Exception as e:
            guard.cancel()
            print(f"  alloc {gb}GB failed: {type(e).__name__}", flush=True)
    print(f"free_hbm_gb: {free}", flush=True)

    a = jax.jit(lambda k: jax.random.normal(k, (4096, 4096), jnp.bfloat16))(
        jax.random.key(0))
    f = jax.jit(lambda a: a @ a)
    o = f(a)
    np.asarray(o.ravel()[:1])
    t0 = time.time()
    for _ in range(5):
        o = f(o)
    np.asarray(o.ravel()[:1])
    ms = (time.time() - t0) / 5 * 1e3
    tf = 2 * 4096**3 * 5 / (time.time() - t0 + 1e-9) / 1e12
    print(f"4096^3 bf16 matmul: {ms:.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
