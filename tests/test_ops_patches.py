"""Unit tests: unfold/fold vs torch, resize vs torch, pools vs torch."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from comfyui_propainter_nodes_tpu.ops import (
    unfold,
    fold,
    fold_normalizer,
    resize_bilinear,
    resize_nearest,
    upflow8,
    max_pool2d,
    avg_pool2d,
)

KS, ST, PD = (7, 7), (3, 3), (3, 3)


def test_unfold_matches_torch():
    rng = np.random.default_rng(0)
    n, h, w, c = 2, 24, 36, 5
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)

    ours = np.asarray(unfold(jnp.asarray(x), KS, ST, PD))  # [N,oh,ow,kh,kw,C]
    oh, ow = ours.shape[1], ours.shape[2]
    # -> torch layout [N, C*kh*kw, L] (channel-major)
    ours_t = ours.transpose(0, 5, 3, 4, 1, 2).reshape(n, c * KS[0] * KS[1], oh * ow)

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.unfold(xt, kernel_size=KS, stride=ST, padding=PD).numpy()
    np.testing.assert_allclose(ours_t, ref, atol=1e-6)


def test_fold_matches_torch():
    rng = np.random.default_rng(1)
    n, c = 2, 3
    h, w = 24, 36
    oh = (h + 2 * PD[0] - KS[0]) // ST[0] + 1
    ow = (w + 2 * PD[1] - KS[1]) // ST[1] + 1
    patches = rng.standard_normal((n, oh, ow, KS[0], KS[1], c)).astype(np.float32)

    ours = np.asarray(fold(jnp.asarray(patches), (h, w), KS, ST, PD))

    pt = torch.from_numpy(
        patches.transpose(0, 5, 3, 4, 1, 2).reshape(n, c * KS[0] * KS[1], oh * ow)
    )
    ref = F.fold(pt, output_size=(h, w), kernel_size=KS, stride=ST, padding=PD)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_fold_unfold_roundtrip_with_normalizer():
    """fold(unfold(x)) / fold(ones) == x — the FusionFeedForward overlap
    renormalization identity (sparse_transformer.py:90-121)."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 24, 36, 2)).astype(np.float32)
    p = unfold(jnp.asarray(x), KS, ST, PD)
    y = fold(p, (24, 36), KS, ST, PD)
    norm = fold_normalizer((p.shape[1], p.shape[2]), (24, 36), KS, ST, PD)
    np.testing.assert_allclose(np.asarray(y / norm[None]), x, atol=1e-5)


@pytest.mark.parametrize(
    "in_hw,out_hw,align",
    [
        ((13, 17), (26, 34), True),
        ((13, 17), (26, 34), False),
        ((24, 36), (6, 9), False),
        ((6, 9), (24, 36), True),
    ],
)
def test_resize_bilinear_matches_torch(in_hw, out_hw, align):
    rng = np.random.default_rng(3)
    n, c = 2, 3
    x = rng.standard_normal((n, *in_hw, c)).astype(np.float32)
    ours = np.asarray(
        resize_bilinear(jnp.asarray(x), out_hw[0], out_hw[1], align_corners=align)
    )
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(xt, size=out_hw, mode="bilinear", align_corners=align)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_resize_nearest_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 24, 36, 3)).astype(np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), 6, 9))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(xt, scale_factor=0.25, mode="nearest")
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=0)


def test_upflow8_matches_torch():
    rng = np.random.default_rng(5)
    f = rng.standard_normal((2, 5, 7, 2)).astype(np.float32)
    ours = np.asarray(upflow8(jnp.asarray(f)))
    ft = torch.from_numpy(f).permute(0, 3, 1, 2)
    ref = 8 * F.interpolate(ft, size=(40, 56), mode="bilinear", align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-5)


def test_max_pool_matches_torch():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 24, 36, 3)).astype(np.float32)
    ours = np.asarray(max_pool2d(jnp.asarray(x), (7, 7), (3, 3), (3, 3)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.max_pool2d(xt, (7, 7), (3, 3), (3, 3)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_avg_pool_matches_torch():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 24, 36, 3)).astype(np.float32)
    ours = np.asarray(avg_pool2d(jnp.asarray(x), (2, 2), (2, 2)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.avg_pool2d(xt, 2, stride=2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_phase_strided_conv_matches_plain():
    """conv2d's space-to-depth strided path == XLA's strided conv for
    every strided-conv geometry the models use (RAFT encoder 7x7/s2 +
    3x3/s2 + 1x1/s2, inpaint encoder 3x3/s2, soft-split 7x7/s3)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from comfyui_propainter_nodes_tpu.ops.conv import _conv2d_phase_strided

    rng = np.random.default_rng(7)

    def plain(x, w, b, stride, padding):
        ph, pw = padding
        return (
            jax.lax.conv_general_dilated(
                x, w, window_strides=stride, padding=((ph, ph), (pw, pw)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + b
        )

    cases = [
        ((2, 36, 64, 5), (3, 3, 5, 16), (2, 2), (1, 1)),
        ((2, 36, 64, 8), (7, 7, 8, 16), (2, 2), (3, 3)),
        ((1, 37, 63, 4), (3, 3, 4, 8), (2, 2), (1, 1)),
        ((1, 36, 64, 4), (7, 7, 4, 8), (3, 3), (3, 3)),
        ((1, 35, 61, 4), (1, 1, 4, 8), (2, 2), (0, 0)),
        ((1, 24, 24, 4), (5, 5, 4, 8), (4, 4), (2, 2)),
    ]
    for xs, ws, st, pd in cases:
        x = jnp.asarray(rng.standard_normal(xs), jnp.float32)
        w = jnp.asarray(rng.standard_normal(ws), jnp.float32)
        b = jnp.asarray(rng.standard_normal(ws[-1]), jnp.float32)
        a = plain(x, w, b, st, pd)
        c = _conv2d_phase_strided(x, w, b, st, pd)
        assert a.shape == c.shape
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-4
        )
