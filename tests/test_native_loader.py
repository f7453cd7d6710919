"""Native C++ data loader: PNG/PGM decode parity with cv2 + prefetch order.

Covers the native runtime component (ssvio_tpu/native/dataloader.cpp) that
replaces the reference's caller-thread OpenCV imread I/O path
(reference test/test_system.cpp:40-43)."""

import os

import numpy as np
import pytest

from ssvio_tpu import native

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


@pytest.mark.parametrize("shape", [(37, 53), (64, 64), (13, 201)])
def test_png_gray_roundtrip(tmp_path, shape):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    # add smooth gradient region so optimal filtering uses Paeth/Sub/Up
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    img[: shape[0] // 2] = ((yy + 2 * xx)[: shape[0] // 2] % 256).astype(np.uint8)
    p = str(tmp_path / "g.png")
    assert cv2.imwrite(p, img)
    out = native.decode_gray(p)
    ref = cv2.imread(p, cv2.IMREAD_GRAYSCALE).astype(np.float32)
    np.testing.assert_array_equal(out, ref)


def test_png_rgb_luma(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(40, 60, 3), dtype=np.uint8)
    p = str(tmp_path / "c.png")
    assert cv2.imwrite(p, img)  # cv2 writes BGR
    out = native.decode_gray(p)
    ref = cv2.imread(p, cv2.IMREAD_GRAYSCALE).astype(np.float32)
    # both use BT.601 luma; rounding may differ by 1 LSB
    assert np.max(np.abs(out - ref)) <= 1.0


def test_png_16bit(tmp_path):
    rng = np.random.default_rng(2)
    img16 = rng.integers(0, 65536, size=(20, 30), dtype=np.uint16)
    p = str(tmp_path / "d16.png")
    assert cv2.imwrite(p, img16)
    out = native.decode_gray(p)
    np.testing.assert_array_equal(out, (img16 >> 8).astype(np.float32))


def test_pgm(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(25, 31), dtype=np.uint8)
    p = str(tmp_path / "g.pgm")
    assert cv2.imwrite(p, img)
    out = native.decode_gray(p)
    np.testing.assert_array_equal(out, img.astype(np.float32))


def test_prefetch_loader_in_order(tmp_path):
    n = 25
    lefts, rights = [], []
    for i in range(n):
        l = np.full((8, 12), i, np.uint8)
        r = np.full((8, 12), 100 + i, np.uint8)
        lp, rp = str(tmp_path / f"l{i}.png"), str(tmp_path / f"r{i}.png")
        cv2.imwrite(lp, l)
        cv2.imwrite(rp, r)
        lefts.append(lp)
        rights.append(rp)
    got = list(native.StereoLoader(lefts, rights, n_threads=3, capacity=4))
    assert len(got) == n
    for i, (l, r) in enumerate(got):
        assert l.shape == (8, 12) and l[0, 0] == i and r[0, 0] == 100 + i


def test_prefetch_loader_skips_bad_frame(tmp_path):
    lefts, rights = [], []
    for i in range(5):
        img = np.full((4, 4), i, np.uint8)
        lp, rp = str(tmp_path / f"l{i}.png"), str(tmp_path / f"r{i}.png")
        cv2.imwrite(lp, img)
        cv2.imwrite(rp, img)
        lefts.append(lp)
        rights.append(rp)
    with open(lefts[2], "wb") as f:
        f.write(b"not a png at all")
    got = list(native.StereoLoader(lefts, rights, n_threads=2, capacity=3))
    assert [int(l[0, 0]) for l, _ in got] == [0, 1, 3, 4]


def test_prefetching_reader_fallback_matches(tmp_path):
    from ssvio_tpu.dataio import kitti
    n = 7
    lefts, rights = [], []
    for i in range(n):
        img = np.full((6, 6), 2 * i, np.uint8)
        lp, rp = str(tmp_path / f"a{i}.png"), str(tmp_path / f"b{i}.png")
        cv2.imwrite(lp, img)
        cv2.imwrite(rp, img)
        lefts.append(lp)
        rights.append(rp)
    pairs = list(kitti.prefetching_reader(lefts, rights, n_threads=2,
                                          capacity=3))
    assert len(pairs) == n
    for i, (l, r) in enumerate(pairs):
        assert l[0, 0] == 2 * i and r[0, 0] == 2 * i
