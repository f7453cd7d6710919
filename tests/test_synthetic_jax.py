"""Parity: the JAX device renderer must match the numpy raycaster."""

import numpy as np

from ssvio_tpu.dataio import synthetic, synthetic_jax


def test_render_matches_numpy():
    world = synthetic.SyntheticWorld(seed=4)
    poses = synthetic.straight_trajectory(3, speed=0.6)
    fx = fy = 350.0
    cx, cy = 160.0, 60.0
    W, H = 320, 120
    b = 0.5

    L_np, R_np = synthetic.render_stereo_sequence_numpy(
        world, poses, fx, fy, cx, cy, b, W, H)
    L_j, R_j = synthetic_jax.render_stereo_sequence_device(
        world, poses, fx, fy, cx, cy, b, W, H, u8=False)
    L_j, R_j = np.asarray(L_j), np.asarray(R_j)

    for est, ref in ((L_j, np.stack(L_np)), (R_j, np.stack(R_np))):
        diff = np.abs(est - ref)
        # f32 vs f64 raycasting: a supersample tap that straddles a block
        # boundary may land one texel off — rare and bounded
        frac_off = (diff > 2.0).mean()
        assert frac_off < 0.02, f"{frac_off:.4f} of pixels differ > 2 gray"
        assert np.median(diff) < 0.5


def test_render_padding_and_u8():
    world = synthetic.SyntheticWorld(seed=1)
    poses = synthetic.straight_trajectory(2, speed=0.5)
    L, R = synthetic_jax.render_stereo_sequence_device(
        world, poses, 350.0, 350.0, 160.0, 60.0, 0.5, 320, 120,
        pad_w=384, pad_h=128, u8=True)
    assert L.shape == (2, 128, 384) and L.dtype == np.uint8
    L = np.asarray(L)
    # edge padding: padded columns replicate the last true column
    np.testing.assert_array_equal(L[:, :120, 320:],
                                  np.repeat(L[:, :120, 319:320], 64, axis=2))
    np.testing.assert_array_equal(L[:, 120:, :],
                                  np.repeat(L[:, 119:120, :], 8, axis=1))
