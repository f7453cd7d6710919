"""Ground-truth device-only chunk throughput: upload all chunks first,
dispatch back-to-back with no intermediate host syncs, block once."""

import os
import time

import jax
import numpy as np

from ssvio_tpu.config import Settings
from ssvio_tpu.system import System

CHUNK = int(os.environ.get("BENCH_CHUNK", "32"))


def main():
    s = Settings()
    W, H = s.image_width, s.image_height
    s.max_features = 512
    s.max_landmarks = 8192
    s.min_init_landmarks = 150
    s.tracking_good = 120

    n_frames = 5 * CHUNK
    cache = os.path.join(os.path.expanduser("~"), ".cache", "ssvio_tpu",
                         f"bench_seed4_n{n_frames}_{W}x{H}_v1.npz")
    z = np.load(cache)
    L = list(z["L"])
    R = list(z["R"])

    sys_ = System(s, enable_backend=True, enable_loop_closing=False)
    t0 = time.time()
    sys_.run_chunk(L[:CHUNK], R[:CHUNK], [0.1 * i for i in range(CHUNK)])
    print(f"warmup+compile {time.time()-t0:.1f}s")

    ups = [sys_.upload_chunk(L[c:c + CHUNK], R[c:c + CHUNK])
           for c in range(CHUNK, n_frames, CHUNK)]
    jax.block_until_ready([u[0] for u in ups])

    t0 = time.time()
    handles = [sys_.dispatch_chunk(u[0], u[1]) for u in ups]
    t1 = time.time()
    # one small fetch at the very end forces completion of the whole chain
    np.asarray(handles[-1][0])
    t2 = time.time()
    n = len(ups) * CHUNK
    print(f"dispatch-all {1e3*(t1-t0):.1f} ms; device total "
          f"{1e3*(t2-t0):.1f} ms for {len(ups)} chunks -> "
          f"{1e3*(t2-t0)/len(ups):.1f} ms/chunk, {n/(t2-t0):.1f} fps")
    t3 = time.time()
    for h in handles:
        sys_.collect_chunk(h)
    print(f"all collects after completion: {1e3*(time.time()-t3):.1f} ms")


if __name__ == "__main__":
    main()
