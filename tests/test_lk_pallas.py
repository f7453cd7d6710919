"""Pallas LK kernel parity vs the XLA path (interpreter mode on CPU)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from ssvio_tpu.ops import fast, lk, pyramid


def _scene(rng):
    img = rng.uniform(0, 255, (192, 256)).astype(np.float32)
    img = cv2.GaussianBlur(img, (7, 7), 1.5)
    M = np.float32([[1, 0, 3.2], [0, 1, -2.1]])
    img2 = cv2.warpAffine(img, M, (256, 192))
    xy, _, v = fast.detect_grid(jnp.asarray(img), max_kps=48, cell=16)
    pts = np.asarray(xy)[np.asarray(v)]
    m = (pts[:, 0] > 30) & (pts[:, 0] < 226) & (pts[:, 1] > 30) & (pts[:, 1] < 162)
    return img, img2, pts[m][:24]


def test_pallas_level_matches_xla(rng):
    img, img2, pts = _scene(rng)
    p = jnp.asarray(pts)
    gx, gy = pyramid.sobel_gradients(jnp.asarray(img))
    params_x = lk.LKParams(backend="xla")
    params_p = lk.LKParams(backend="pallas_interpret", kernel="serial")
    v = jnp.ones(p.shape[0], bool)
    out_x, ok_x = lk._track_level(jnp.asarray(img), jnp.asarray(img2),
                                  gx, gy, p, p, v, params_x)
    out_p, ok_p = lk._track_level(jnp.asarray(img), jnp.asarray(img2),
                                  gx, gy, p, p, v, params_p)
    np.testing.assert_array_equal(np.asarray(ok_x), np.asarray(ok_p))
    both = np.asarray(ok_x)
    np.testing.assert_allclose(np.asarray(out_p)[both], np.asarray(out_x)[both],
                               atol=1e-3)


def test_pallas_full_track_matches_xla(rng):
    img, img2, pts = _scene(rng)
    pyr1 = pyramid.build_lk_pyramid(jnp.asarray(img), 3)
    pyr2 = pyramid.build_lk_pyramid(jnp.asarray(img2), 3)
    p = jnp.asarray(pts)
    valid = jnp.ones(len(pts), bool)
    out_x, ok_x, err_x = lk.track(pyr1, pyr2, p, p, valid,
                                  lk.LKParams(backend="xla"))
    out_p, ok_p, err_p = lk.track(pyr1, pyr2, p, p, valid,
                                  lk.LKParams(backend="pallas_interpret",
                                              kernel="serial"))
    both = np.asarray(ok_x) & np.asarray(ok_p)
    assert both.mean() > 0.8
    np.testing.assert_allclose(np.asarray(out_p)[both], np.asarray(out_x)[both],
                               atol=1e-2)
    # and both recover the true shift
    flow = np.asarray(out_p)[both] - pts[both]
    np.testing.assert_allclose(np.median(flow, axis=0), [3.2, -2.1], atol=0.2)


@pytest.mark.slow
def test_mm_kernel_matches_xla(rng):
    """Matmul-sampling lockstep kernel (interpret mode, f32) vs XLA path."""
    img, img2, pts = _scene(rng)
    pyr1 = pyramid.build_lk_pyramid(jnp.asarray(img), 3)
    pyr2 = pyramid.build_lk_pyramid(jnp.asarray(img2), 3)
    p = jnp.asarray(pts)
    valid = jnp.ones(len(pts), bool)
    out_x, ok_x, _ = lk.track(pyr1, pyr2, p, p, valid,
                              lk.LKParams(backend="xla"))
    out_m, ok_m, _ = lk.track(pyr1, pyr2, p, p, valid,
                              lk.LKParams(backend="pallas_interpret",
                                          kernel="mm_f32"))
    both = np.asarray(ok_x) & np.asarray(ok_m)
    assert both.sum() >= 0.8 * len(pts)
    np.testing.assert_allclose(np.asarray(out_m)[both],
                               np.asarray(out_x)[both], atol=0.05)


def test_sw_level_matches_xla(rng):
    """Fast default-tier parity for the user-selectable 'sw' kernel
    (single level — the full-track variant check stays in the slow tier;
    advisor finding r3)."""
    img, img2, pts = _scene(rng)
    p = jnp.asarray(pts)
    gx, gy = pyramid.sobel_gradients(jnp.asarray(img))
    v = jnp.ones(p.shape[0], bool)
    out_x, ok_x = lk._track_level(jnp.asarray(img), jnp.asarray(img2),
                                  gx, gy, p, p, v, lk.LKParams(backend="xla"))
    out_s, ok_s = lk._track_level(jnp.asarray(img), jnp.asarray(img2),
                                  gx, gy, p, p, v,
                                  lk.LKParams(backend="pallas_interpret",
                                              kernel="sw"))
    both = np.asarray(ok_x) & np.asarray(ok_s)
    assert both.sum() >= 0.8 * len(pts)
    np.testing.assert_allclose(np.asarray(out_s)[both],
                               np.asarray(out_x)[both], atol=0.05)


def test_sw_kernel_window_guard():
    """'sw' rejects windows its static branch list cannot cover (win >= 24
    would silently clamp lax.switch to the wrong slice — advisor r3)."""
    from ssvio_tpu.ops import lk_pallas_variants
    z = jnp.zeros((64, 256), jnp.float32)
    p = jnp.zeros((8, 2), jnp.float32)
    f = jnp.zeros((8, 1), jnp.int32)
    with pytest.raises(AssertionError, match="win <= 23"):
        lk_pallas_variants.lk_level_vmem_sw(
            z, z, z, z, p, p, f, win=25, iters=1, eps=0.01, min_eig=1e-4,
            interpret=True)


@pytest.mark.slow
def test_pk_kernels_match_xla(rng):
    """Per-keypoint serial kernel variants ('ymm', 'pkmm' matmul sampling,
    'sw' static-slice switch) vs XLA path."""
    img, img2, pts = _scene(rng)
    pyr1 = pyramid.build_lk_pyramid(jnp.asarray(img), 3)
    pyr2 = pyramid.build_lk_pyramid(jnp.asarray(img2), 3)
    p = jnp.asarray(pts)
    valid = jnp.ones(len(pts), bool)
    out_x, ok_x, _ = lk.track(pyr1, pyr2, p, p, valid,
                              lk.LKParams(backend="xla"))
    for kern in ("ymm", "pkmm", "sw"):
        out_k, ok_k, _ = lk.track(pyr1, pyr2, p, p, valid,
                                  lk.LKParams(backend="pallas_interpret",
                                              kernel=kern))
        both = np.asarray(ok_x) & np.asarray(ok_k)
        assert both.sum() >= 0.8 * len(pts), kern
        np.testing.assert_allclose(np.asarray(out_k)[both],
                                   np.asarray(out_x)[both], atol=0.05,
                                   err_msg=kern)


@pytest.mark.slow
def test_mm_kernel_bf16_close(rng):
    """bf16 sampling matmuls stay within a small fraction of a pixel of the
    f32 result (quantized interpolation weights). Slow tier: the 'mm'
    kernel is not the production default (needs a newer Mosaic on
    hardware, see LKParams.kernel)."""
    img, img2, pts = _scene(rng)
    pyr1 = pyramid.build_lk_pyramid(jnp.asarray(img), 3)
    pyr2 = pyramid.build_lk_pyramid(jnp.asarray(img2), 3)
    p = jnp.asarray(pts)
    valid = jnp.ones(len(pts), bool)
    out_f, ok_f, _ = lk.track(pyr1, pyr2, p, p, valid,
                              lk.LKParams(backend="pallas_interpret",
                                          kernel="mm_f32"))
    out_b, ok_b, _ = lk.track(pyr1, pyr2, p, p, valid,
                              lk.LKParams(backend="pallas_interpret",
                                          kernel="mm"))
    both = np.asarray(ok_f) & np.asarray(ok_b)
    assert both.sum() >= 0.8 * len(pts)
    err = np.abs(np.asarray(out_b)[both] - np.asarray(out_f)[both])
    assert err.max() < 0.35, err.max()
