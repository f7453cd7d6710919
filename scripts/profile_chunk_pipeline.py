"""Instrument bench.py's pipelined chunk loop: upload vs dispatch vs collect
vs pure device compute, per chunk, on the real device."""

import os
import time

import jax
import numpy as np

from ssvio_tpu.config import Settings
from ssvio_tpu.dataio import synthetic
from ssvio_tpu.system import System

CHUNK = int(os.environ.get("BENCH_CHUNK", "32"))


def main():
    s = Settings()
    FX, FY, CX, CY = (s.cam_left.fx, s.cam_left.fy, s.cam_left.cx, s.cam_left.cy)
    W, H = s.image_width, s.image_height
    B = s.baseline
    s.max_features = 512
    s.max_landmarks = 8192
    s.min_init_landmarks = 150
    s.tracking_good = 120

    n_frames = 5 * CHUNK
    poses = synthetic.straight_trajectory(n_frames, speed=0.6, yaw_rate=0.0)
    cache = os.path.join(os.path.expanduser("~"), ".cache", "ssvio_tpu",
                         f"bench_seed4_n{n_frames}_{W}x{H}_v1.npz")
    z = np.load(cache)
    L = list(z["L"])
    R = list(z["R"])

    sys_ = System(s, enable_backend=True, enable_loop_closing=False)
    t0 = time.time()
    sys_.run_chunk(L[:CHUNK], R[:CHUNK], [0.1 * i for i in range(CHUNK)])
    print(f"warmup+compile {time.time()-t0:.1f}s")

    # pure device compute per chunk: upload everything first, then dispatch
    # + block with no interleaved host work
    ups = [sys_.upload_chunk(L[c:c + CHUNK], R[c:c + CHUNK])
           for c in range(CHUNK, n_frames, CHUNK)]
    jax.block_until_ready([u[0] for u in ups])
    for i, up in enumerate(ups):
        t0 = time.time()
        h = sys_.dispatch_chunk(up[0], up[1])
        jax.block_until_ready(h[0])
        t1 = time.time()
        sys_.collect_chunk(h)
        print(f"chunk {i}: compute {1e3*(t1-t0):7.1f} ms   "
              f"collect {1e3*(time.time()-t1):6.1f} ms")

    # fresh system: timed stages in the prefetcher-pipelined loop
    sys_ = System(s, enable_backend=True, enable_loop_closing=False)
    sys_.run_chunk(L[:CHUNK], R[:CHUNK], [0.1 * i for i in range(CHUNK)])
    pf = sys_.prefetcher()
    pf.submit(L[CHUNK:2 * CHUNK], R[CHUNK:2 * CHUNK])
    pending = None
    for c in range(CHUNK, n_frames, CHUNK):
        t0 = time.time()
        cur = pf.get()
        t1 = time.time()
        h = sys_.dispatch_chunk(cur[0], cur[1])
        t2 = time.time()
        nxt = c + CHUNK
        if nxt < n_frames:
            pf.submit(L[nxt:nxt + CHUNK], R[nxt:nxt + CHUNK])
        if pending is not None:
            sys_.collect_chunk(pending)
        t3 = time.time()
        pending = h
        print(f"iter {c//CHUNK}: get {1e3*(t1-t0):6.1f}  "
              f"dispatch {1e3*(t2-t1):6.1f}  collect {1e3*(t3-t2):6.1f}  "
              f"total {1e3*(t3-t0):7.1f} ms")
    t0 = time.time()
    sys_.collect_chunk(pending)
    print(f"final collect {1e3*(time.time()-t0):6.1f} ms")
    pf.close()


if __name__ == "__main__":
    main()
