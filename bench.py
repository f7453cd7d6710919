"""Benchmark: stereo VO frames/s per chip on KITTI-resolution synthetic data.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers; KITTI is fed at its nominal
10 fps (reference config/kitti_00.yaml:28 — see BASELINE.md). vs_baseline is
therefore fps / 10.0; the BASELINE.json target is >=5x (>=50 fps/chip).

The measured path is the CHUNKED device-resident pipeline (ssvio_tpu/
engine.py): a lax.scan over the complete per-frame step — pyramid build,
seeded pyramidal LK + FB gate, 4x10 pose-only LM, tracking state machine,
keyframe insertion + stereo triangulation + sliding-window BA under
lax.cond — with one host->device image upload and one scalar/pose readback
per chunk. Keyframe/BA work therefore rides INSIDE the measured time
(wall-clock over all steady-state chunks), unlike a tracking-only number.
"""

import json
import os
import time

import numpy as np

CHUNK = int(os.environ.get("BENCH_CHUNK", "32"))


def main():
    import jax

    # persistent compile cache: the chunk program takes 1-6 min to compile
    # on the remote compile service; cache it across bench invocations
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.expanduser("~"), ".cache",
                                   "jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ssvio_tpu.config import Settings
    from ssvio_tpu.dataio import synthetic
    from ssvio_tpu.eval import ate
    from ssvio_tpu.system import System

    # KITTI 00 geometry (reference config) on synthetic imagery
    s = Settings()
    FX, FY, CX, CY = (s.cam_left.fx, s.cam_left.fy, s.cam_left.cx, s.cam_left.cy)
    W, H = s.image_width, s.image_height
    B = s.baseline
    s.max_features = 512
    s.max_landmarks = 8192
    s.min_init_landmarks = 150
    s.tracking_good = 120        # KF cadence scaled to the 512 budget

    n_frames = int(os.environ.get("BENCH_FRAMES", 10 * CHUNK))
    n_frames -= n_frames % CHUNK
    # need at least a warmup chunk plus one timed chunk
    n_frames = max(n_frames, 2 * CHUNK)
    # default corridor (walls at +-8 m): enough NEAR structure that stereo
    # init clears min_init_landmarks under the 60x-baseline depth cap.
    # yaw_rate 0: steady-state workload — a nonzero yaw slowly angles the
    # camera into a wall and the keyframe cadence (hence BA rate) drifts
    # with sequence length, which made fps depend on n_frames.
    poses = synthetic.straight_trajectory(n_frames, speed=0.6, yaw_rate=0.0)
    # the KITTI-resolution raycast costs ~3.4 s/stereo pair on this host —
    # cache the rendered uint8 frames on disk so only the first bench
    # invocation on a machine pays it. A shorter cached prefix of the same
    # (deterministic, straight) trajectory is reused and only the missing
    # tail is rendered.
    cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "ssvio_tpu")
    cache = os.path.join(cache_dir,
                         f"bench_seed4_n{n_frames}_{W}x{H}_v1.npz")
    L, R = [], []
    if os.path.exists(cache):
        z = np.load(cache)
        L = list(z["L"])
        R = list(z["R"])
    else:
        import glob
        import re
        # reuse the longest existing cache of the same deterministic
        # trajectory: a shorter one is a prefix, a longer one is sliced
        cands = []
        for prior in glob.glob(os.path.join(
                cache_dir, f"bench_seed4_n*_{W}x{H}_v1.npz")):
            m = re.search(r"_n(\d+)_", prior)
            if m:
                cands.append((int(m.group(1)), prior))
        if cands:
            _, best = max(cands)
            z = np.load(best)
            L = list(z["L"][:n_frames])
            R = list(z["R"][:n_frames])
    if len(L) < n_frames:
        world = synthetic.SyntheticWorld(seed=4)
        Lt, Rt = synthetic.render_stereo_sequence(
            world, poses[len(L):], FX, FY, CX, CY, B, W, H)
        # camera-native uint8 frames: what a real sensor/KITTI provides, and
        # 4x fewer bytes over the host->device link (engine promotes to f32
        # on device)
        L += [np.clip(im, 0, 255).astype(np.uint8) for im in Lt]
        R += [np.clip(im, 0, 255).astype(np.uint8) for im in Rt]
        os.makedirs(cache_dir, exist_ok=True)
        tmp = cache + ".tmp.npz"
        np.savez_compressed(tmp, L=np.stack(L), R=np.stack(R))
        os.replace(tmp, cache)

    sys_ = System(s, enable_backend=True, enable_loop_closing=False)
    # start uploading chunk 1 behind the warmup's compile+compute so the
    # timed loop starts with a full pipeline
    pf = sys_.prefetcher()
    pf.submit(L[CHUNK:2 * CHUNK], R[CHUNK:2 * CHUNK])
    # warmup chunk: compiles the whole scan program (init+track+KF branches)
    t_first = time.time()
    est = [sys_.run_chunk(L[:CHUNK], R[:CHUNK],
                          [0.1 * i for i in range(CHUNK)])]
    compile_s = time.time() - t_first

    # steady state: every chunk timed, keyframe/BA work included.
    # Three-way overlap: the device computes chunk k while the prefetcher
    # thread pads+uploads chunk k+1 (H2D transfers overlap compute on this
    # link but block the issuing host thread — see System.prefetcher) and
    # the main thread collects/records chunk k-1 (the reference gets this
    # overlap from its frontend/backend thread split).
    chunk_times = []
    pending = None
    for c in range(CHUNK, n_frames, CHUNK):
        t0 = time.time()
        cur = pf.get()
        h = sys_.dispatch_chunk(cur[0], cur[1],
                                [0.1 * (c + j) for j in range(CHUNK)])
        nxt = c + CHUNK
        if nxt < n_frames:
            pf.submit(L[nxt:nxt + CHUNK], R[nxt:nxt + CHUNK])
        if pending is not None:
            est.append(sys_.collect_chunk(pending))
        pending = h
        chunk_times.append(time.time() - t0)
    t0 = time.time()
    est.append(sys_.collect_chunk(pending))
    chunk_times.append(time.time() - t0)
    pf.close()

    fps = (n_frames - CHUNK) / sum(chunk_times)
    est = np.concatenate(est, axis=0)
    stats = ate.ape_translation(est[:, :, 3], poses[:, :, 3])

    result = {
        "metric": "frames_per_second_per_chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 10.0, 2),
        "extra": {
            "chunk": CHUNK,
            "chunk_ms_median": round(1e3 * float(np.median(chunk_times)), 1),
            "n_keyframes": sys_.stats["n_keyframes"],
            "ate_rmse_m": round(stats["rmse"], 4),
            "compile_s": round(compile_s, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
