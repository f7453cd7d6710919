"""Microbenchmark: matmul-sampling LK kernel vs serial roll/blend kernel.

Dispatch-train timing (see PERF.md methodology): the kernel is repeated in
a chain inside one jit so the per-dispatch tunnel latency amortizes away.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ssvio_tpu.ops import lk, pyramid


def timeit(name, fn, n=4):
    fn()  # compile
    jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.time() - t0) / n * 1e3:8.2f} ms")


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    z = np.load(os.path.expanduser(
        "~/.cache/ssvio_tpu/bench_seed4_n320_1241x376_v1.npz"))
    H, W = 384, 1280
    pad0 = np.zeros((H, W), np.float32); pad0[:376, :1241] = z["L"][100]
    pad1 = np.zeros((H, W), np.float32); pad1[:376, :1241] = z["L"][101]
    pyr0 = pyramid.build_lk_pyramid(jnp.asarray(pad0), 3)
    pyr1 = pyramid.build_lk_pyramid(jnp.asarray(pad1), 3)
    g0 = [pyramid.sobel_gradients(l) for l in pyr0]
    grads0 = (tuple(g[0] for g in g0), tuple(g[1] for g in g0))

    N = 512
    pts = np.stack([rng.uniform(20, 1220, N),
                    rng.uniform(20, 360, N)], -1).astype(np.float32)
    pts = jnp.asarray(pts)
    valid = jnp.ones((N,), bool)

    for name, prm in [
        ("serial kernel, full track (3 lvl)",
         lk.LKParams(backend="pallas", kernel="serial")),
        ("mm kernel f32, full track",
         lk.LKParams(backend="pallas", kernel="mm_f32")),
    ]:
        def chain(prm=prm, reps=4):
            def body(c, _):
                p, v = c
                out, ok, _ = lk.track(pyr0, pyr1, p, p + 0.01, v, prm,
                                      compute_err=False, grads_prev=grads0)
                return (out, v & ok), ()
            (p, v), _ = jax.lax.scan(body, (pts, valid), None, length=reps)
            return p
        f = jax.jit(chain)
        timeit(name, f)


if __name__ == "__main__":
    main()
