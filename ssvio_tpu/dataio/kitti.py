"""KITTI odometry dataset loader (host side).

Capability parity with the reference loader
(reference include/common/read_kitii_dataset.hpp:16-60): reads `times.txt`
plus `image_0/` and `image_1/` grayscale stereo pairs of a KITTI odometry
sequence directory, and the ground-truth poses file for evaluation
(reference scripts/kitti_poses_and_timestamps_to_trajectory.py:14-25).
"""

from __future__ import annotations

import os
from typing import Iterator, List, Tuple

import numpy as np


def load_image_paths_and_timestamps(seq_dir: str) -> Tuple[List[str], List[str], np.ndarray]:
    """Returns (left_paths, right_paths, timestamps [N]).

    Mirrors the reference's directory layout: `<seq>/times.txt`,
    `<seq>/image_0/%06d.png`, `<seq>/image_1/%06d.png`.
    """
    times_path = os.path.join(seq_dir, "times.txt")
    with open(times_path, "r") as f:
        timestamps = np.array([float(line.strip()) for line in f if line.strip()],
                              dtype=np.float64)
    n = len(timestamps)
    left = [os.path.join(seq_dir, "image_0", f"{i:06d}.png") for i in range(n)]
    right = [os.path.join(seq_dir, "image_1", f"{i:06d}.png") for i in range(n)]
    return left, right, timestamps


def read_gray(path: str) -> np.ndarray:
    """Load a grayscale image as float32 [H, W] in [0, 255]."""
    import cv2
    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img.astype(np.float32)


def prefetching_reader(left: List[str], right: List[str],
                       n_threads: int = 4, capacity: int = 8,
                       ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """In-order stereo pair iterator with background decode.

    Uses the native C++ ring loader (ssvio_tpu/native/dataloader.cpp) when
    it can be built; otherwise a Python thread-pool prefetcher over cv2.
    Either way the per-frame device step never blocks on disk/PNG inflate
    (the reference decodes synchronously on the caller thread,
    reference test/test_system.cpp:40-43).
    """
    from ssvio_tpu import native
    if native.available():
        yield from native.StereoLoader(left, right, n_threads=n_threads,
                                       capacity=capacity)
        return
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=n_threads) as pool:
        futs = []
        i = 0
        for j in range(min(capacity, len(left))):
            futs.append(pool.submit(lambda a, b: (read_gray(a), read_gray(b)),
                                    left[j], right[j]))
        nxt = len(futs)
        while i < len(left):
            yield futs[i % capacity].result()
            if nxt < len(left):
                futs[nxt % capacity] = pool.submit(
                    lambda a, b: (read_gray(a), read_gray(b)),
                    left[nxt], right[nxt])
                nxt += 1
            i += 1


def iterate_stereo(seq_dir: str) -> Iterator[Tuple[np.ndarray, np.ndarray, float]]:
    left, right, ts = load_image_paths_and_timestamps(seq_dir)
    for lp, rp, t in zip(left, right, ts):
        yield read_gray(lp), read_gray(rp), float(t)


def load_kitti_gt_poses(poses_path: str) -> np.ndarray:
    """KITTI ground-truth poses file: N lines of 12 floats (3x4 T_wc).

    Returns [N, 3, 4] float64 (camera-to-world, KITTI convention).
    """
    data = np.loadtxt(poses_path, dtype=np.float64)
    if data.ndim == 1:
        data = data[None]
    return data.reshape(-1, 3, 4)


def kitti_gt_to_tum(poses_path: str, times_path: str, out_path: str) -> None:
    """Ground truth + times -> TUM trajectory file, the reference's evo prep
    step (reference scripts/kitti_poses_and_timestamps_to_trajectory.py)."""
    from ssvio_tpu.dataio import tum
    poses = load_kitti_gt_poses(poses_path)
    with open(times_path) as f:
        ts = np.array([float(x) for x in f.read().split() if x], dtype=np.float64)
    tum.save_tum(out_path, ts[: len(poses)], poses)
