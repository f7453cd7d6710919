"""Oriented BRIEF (ORB-style) descriptors, batched over keypoints.

Capability parity with the reference ORBextractor's orientation + descriptor
stages (reference src/ssvio/orbextractor.cpp: IC_Angle :15-43,
computeOrbDescriptor :46-91, CalcDescriptors :943-991): intensity-centroid
orientation over a radius-15 circular patch, then a 256-pair steered binary
test packed into 32 bytes.

Design notes (TPU-first, not a port):
- The reference uses ORB-SLAM's learned `bit_pattern_31_` table
  (reference src/ssvio/orbpattern.cpp). We deliberately do NOT copy that
  table: descriptors here are self-consistent within the engine (matching,
  vocabulary, loop closing are all trained/performed on OUR descriptors), so
  we generate the classic BRIEF sampling pattern procedurally — Gaussian
  (0, patch/5) pairs, seeded and deterministic (Calonder et al., BRIEF,
  ECCV 2010) — with a greedy decorrelation pass in the spirit of ORB's
  offline learning (Rublee et al., ICCV 2011).
- All keypoints are processed as one batch of flat gathers; bit packing is
  a [N, 256] bool -> [N, 8] uint32 dot with power-of-two weights.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssvio_tpu.ops import sampling

PATCH_RADIUS = 15          # IC-angle circular patch radius (reference HALF_PATCH_SIZE)
DESC_BITS = 256
DESC_WORDS = 8             # uint32 words per descriptor


@functools.lru_cache()
def brief_pattern(seed: int = 1234) -> np.ndarray:
    """[256, 4] int8 sampling pairs (x1, y1, x2, y2) in a 31x31 patch.

    Gaussian-sampled i.i.d. pairs (BRIEF GI sampling: sigma = patch/5 = 6.2),
    clipped to +-13 so rotated taps stay inside the 31x31 window for any
    angle (13 * sqrt(2) < 15 within rounding slack).
    """
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, 6.2, size=(DESC_BITS * 4, 2))
    pts = np.clip(np.round(pts), -13, 13).astype(np.int8)
    pairs = pts.reshape(DESC_BITS * 2, 4)
    # drop degenerate pairs (identical endpoints), keep first 256
    good = pairs[(pairs[:, 0] != pairs[:, 2]) | (pairs[:, 1] != pairs[:, 3])]
    assert len(good) >= DESC_BITS
    return good[:DESC_BITS]


@functools.lru_cache()
def _ic_angle_offsets() -> Tuple[np.ndarray, np.ndarray]:
    """Circular-patch tap offsets [(K, 2) int32 (dx, dy)] and mask weights."""
    r = PATCH_RADIUS
    ys, xs = np.mgrid[-r:r + 1, -r:r + 1]
    mask = (xs ** 2 + ys ** 2) <= r ** 2
    offs = np.stack([xs[mask], ys[mask]], axis=-1).astype(np.int32)
    return offs, offs.astype(np.float32)


def ic_angle(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation per keypoint.

    img [H, W] float32; xy [N, 2]. Returns angle [N] radians.
    Matches reference IC_Angle semantics (orbextractor.cpp:15-43):
    theta = atan2(m01, m10) over the circular radius-15 patch.
    """
    offs, offs_f = _ic_angle_offsets()
    taps = xy[:, None, :] + jnp.asarray(offs_f)           # [N, K, 2]
    vals = sampling.gather_nn(img, taps)                  # [N, K]
    m10 = jnp.sum(vals * jnp.asarray(offs_f[:, 0])[None], axis=1)
    m01 = jnp.sum(vals * jnp.asarray(offs_f[:, 1])[None], axis=1)
    return jnp.arctan2(m01, m10)


def compute_descriptors(img_blurred: jnp.ndarray, xy: jnp.ndarray,
                        angle: jnp.ndarray, seed: int = 1234) -> jnp.ndarray:
    """Steered-BRIEF descriptors.

    img_blurred: [H, W] float32, pre-blurred (reference applies GaussianBlur
      7x7 sigma=2 before descriptors, orbextractor.cpp:962).
    xy: [N, 2] keypoint positions (in this image's scale).
    angle: [N] orientation radians.

    Returns [N, 8] uint32 (256 bits packed little-endian within words).
    """
    pat = jnp.asarray(brief_pattern(seed).astype(np.float32))  # [256, 4]
    ca = jnp.cos(angle)[:, None]                                # [N, 1]
    sa = jnp.sin(angle)[:, None]
    # rotate both endpoints of each pair by the keypoint angle
    def rot(px, py):
        return px * ca - py * sa, px * sa + py * ca
    x1, y1 = rot(pat[None, :, 0], pat[None, :, 1])              # [N, 256]
    x2, y2 = rot(pat[None, :, 2], pat[None, :, 3])
    p1 = jnp.stack([xy[:, None, 0] + x1, xy[:, None, 1] + y1], axis=-1)
    p2 = jnp.stack([xy[:, None, 0] + x2, xy[:, None, 1] + y2], axis=-1)
    v1 = sampling.gather_nn(img_blurred, p1)                    # [N, 256]
    v2 = sampling.gather_nn(img_blurred, p2)
    bits = (v1 < v2).astype(jnp.uint32)                         # [N, 256]
    bits = bits.reshape(-1, DESC_WORDS, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)   # [N, 8]


def hamming_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Popcount Hamming distance between packed descriptors.

    a [..., 8] uint32, b [..., 8] uint32 (broadcastable) -> [...] int32.
    (The reference's DBoW2 FORB::distance popcount, thirdparty
    DBoW2/DBoW2/FORB.cpp:81-101, vectorized.)
    """
    x = jnp.bitwise_xor(a, b)
    return jnp.sum(_popcount32(x), axis=-1).astype(jnp.int32)


def _popcount32(x: jnp.ndarray) -> jnp.ndarray:
    """Bit-twiddling popcount for uint32 arrays (SWAR)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def match_brute_force(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                      valid_a: jnp.ndarray, valid_b: jnp.ndarray,
                      max_dist_abs: int = 30, ratio_vs_min: float = 2.0):
    """Brute-force Hamming matching with the reference's acceptance rule.

    Mirrors LoopClosing::MatchFeatures (reference src/ssvio/loopclosing.cpp:
    105-145): keep a->b nearest matches with d <= max(ratio*min_d, abs_th),
    deduped by enforcing mutual consistency (array analog of the pair-dedupe).

    Returns (idx_b [Na] int32, dist [Na] int32, ok [Na] bool).
    """
    # distance matrix via popcount over broadcast XOR: [Na, Nb]
    d = hamming_distance(desc_a[:, None, :], desc_b[None, :, :])
    big = jnp.int32(512)
    d = jnp.where(valid_a[:, None] & valid_b[None, :], d, big)
    idx_b = jnp.argmin(d, axis=1).astype(jnp.int32)
    best = jnp.min(d, axis=1)
    min_d = jnp.min(jnp.where(best < big, best, big))
    thresh = jnp.maximum((ratio_vs_min * min_d).astype(jnp.int32),
                         jnp.int32(max_dist_abs))
    # mutual check: b's best must point back at a
    back = jnp.argmin(d, axis=0).astype(jnp.int32)        # [Nb]
    mutual = back[idx_b] == jnp.arange(d.shape[0], dtype=jnp.int32)
    ok = (best <= thresh) & (best < big) & mutual & valid_a
    return idx_b, best.astype(jnp.int32), ok
