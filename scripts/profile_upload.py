"""Characterize host->device transfer over the axon tunnel."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def bw(name, arr, n=6):
    out = jax.device_put(arr)
    out.block_until_ready()
    t0 = time.time()
    for _ in range(n):
        jax.device_put(arr).block_until_ready()
    dt = (time.time() - t0) / n
    mb = arr.nbytes / 1e6
    print(f"{name:34s} {1e3 * dt:8.1f} ms  {mb / dt:8.1f} MB/s")


def main():
    h, w = 384, 1248
    one_u8 = np.random.randint(0, 255, (h, w), np.uint8)
    bw("1 frame u8 (0.5 MB)", one_u8)
    bw("8 frames u8 (3.8 MB)", np.broadcast_to(one_u8, (8, h, w)).copy())
    bw("32 frames u8 (15 MB)", np.broadcast_to(one_u8, (32, h, w)).copy())
    bw("64 MB u8 blob", np.random.randint(0, 255, (64 << 20,), np.uint8), n=3)
    bw("8 frames f32 (15 MB)",
       np.random.uniform(0, 255, (8, h, w)).astype(np.float32))

    # overlap test: does device_put overlap with device compute?
    big = jnp.ones((4096, 4096), jnp.float32)
    f = jax.jit(lambda x: (x @ x).sum())
    f(big).block_until_ready()
    t0 = time.time()
    r = f(big)                      # async dispatch
    up = jax.device_put(np.broadcast_to(one_u8, (8, h, w)).copy())
    up.block_until_ready()
    r.block_until_ready()
    both = time.time() - t0
    t0 = time.time()
    f(big).block_until_ready()
    comp = time.time() - t0
    print(f"overlap: compute {1e3*comp:.1f} ms, compute+upload {1e3*both:.1f} ms")

    # two puts in flight
    a1 = np.broadcast_to(one_u8, (8, h, w)).copy()
    a2 = a1.copy()
    t0 = time.time()
    u1 = jax.device_put(a1)
    u2 = jax.device_put(a2)
    u1.block_until_ready(); u2.block_until_ready()
    print(f"two puts in flight: {1e3 * (time.time() - t0):.1f} ms")


if __name__ == "__main__":
    main()
