"""Characterize the host<->TPU tunnel: H2D bandwidth, D2H latency, and
whether transfers overlap device compute (threaded uploads)."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    # --- D2H latency for a tiny array
    x = jnp.zeros((16,), jnp.float32).block_until_ready()
    for _ in range(2):
        t0 = time.time()
        np.asarray(x)
        print(f"tiny D2H fetch: {1e3*(time.time()-t0):.1f} ms")

    # --- H2D bandwidth at bench chunk size
    buf = np.random.randint(0, 255, (32, 384, 1280), np.uint8)
    for _ in range(3):
        t0 = time.time()
        a = jnp.asarray(buf)
        a.block_until_ready()
        dt = time.time() - t0
        print(f"H2D 15.7MB: {1e3*dt:.1f} ms  ({buf.nbytes/dt/1e6:.0f} MB/s)")

    # --- device_put async? (host-blocking time vs total)
    t0 = time.time()
    a = jax.device_put(buf)
    t1 = time.time()
    a.block_until_ready()
    print(f"device_put returns after {1e3*(t1-t0):.1f} ms, "
          f"ready after {1e3*(time.time()-t0):.1f} ms")

    # --- compute kernel ~400ms
    M = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def heavy(m):
        def body(c, _):
            return jnp.tanh(c @ m), ()
        c, _ = jax.lax.scan(body, m, None, length=60)
        return c

    heavy(M).block_until_ready()
    t0 = time.time()
    r = heavy(M)
    r.block_until_ready()
    comp = time.time() - t0
    print(f"compute alone: {1e3*comp:.1f} ms")

    # --- overlap test: dispatch compute, then upload on main thread
    t0 = time.time()
    r = heavy(M)
    t1 = time.time()
    a = jnp.asarray(buf)
    a.block_until_ready()
    t2 = time.time()
    r.block_until_ready()
    t3 = time.time()
    print(f"dispatch {1e3*(t1-t0):.1f} | upload-during-compute "
          f"{1e3*(t2-t1):.1f} | wait-compute {1e3*(t3-t2):.1f} | "
          f"total {1e3*(t3-t0):.1f} ms (serial would be "
          f"{1e3*(comp+0.27):.0f})")

    # --- overlap test with a background upload thread
    res = {}

    def up():
        t = time.time()
        a = jnp.asarray(buf)
        a.block_until_ready()
        res["up"] = time.time() - t

    th = threading.Thread(target=up)
    t0 = time.time()
    r = heavy(M)
    th.start()
    r.block_until_ready()
    t3 = time.time()
    th.join()
    print(f"threaded: total {1e3*(t3-t0):.1f} ms, upload thread "
          f"{1e3*res['up']:.1f} ms")

    # --- D2H of small array right after dispatching compute (queue-drain?)
    small = jnp.zeros((600,), jnp.float32).block_until_ready()
    r = heavy(M)
    t0 = time.time()
    np.asarray(small)
    print(f"small D2H while compute in flight: {1e3*(time.time()-t0):.1f} ms")
    r.block_until_ready()


if __name__ == "__main__":
    main()
