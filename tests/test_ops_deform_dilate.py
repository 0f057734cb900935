"""Unit tests: deformable conv vs a numpy oracle; dilation vs scipy."""

import numpy as np
import scipy.ndimage
import jax.numpy as jnp

from comfyui_propainter_nodes_tpu.ops import deform_conv2d, binary_dilation, binarize


def _np_deform_conv2d(x, offset, mask, weight, bias, pad=1):
    """Slow numpy oracle for torchvision.ops.deform_conv2d (stride 1,
    dilation 1, zeros-padding bilinear sampling, modulated).

    x: [N, Cin, H, W]; offset: [N, 2*G*K, H, W] with (dy, dx) channel pairs;
    mask: [N, G*K, H, W]; weight: [Cout, Cin, kh, kw].
    """
    n, cin, h, w = x.shape
    cout, _, kh, kw = weight.shape
    k = kh * kw
    g = mask.shape[1] // k
    cg = cin // g
    out = np.zeros((n, cout, h, w), dtype=np.float64)

    def sample(img2d, y, xx):
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        val = 0.0
        for dy_i, wy in ((y0, 1 - (y - y0)), (y0 + 1, y - y0)):
            for dx_i, wx in ((x0, 1 - (xx - x0)), (x0 + 1, xx - x0)):
                if 0 <= dy_i < h and 0 <= dx_i < w:
                    val += wy * wx * img2d[dy_i, dx_i]
        return val

    for ni in range(n):
        for i in range(h):
            for j in range(w):
                for gi in range(g):
                    for ki in range(kh):
                        for kj in range(kw):
                            kk = ki * kw + kj
                            dy = offset[ni, 2 * (gi * k + kk), i, j]
                            dx = offset[ni, 2 * (gi * k + kk) + 1, i, j]
                            m = mask[ni, gi * k + kk, i, j]
                            y = i + ki - pad + dy
                            xx = j + kj - pad + dx
                            for cc in range(cg):
                                c_in = gi * cg + cc
                                v = sample(x[ni, c_in], y, xx) * m
                                out[ni, :, i, j] += v * weight[:, c_in, ki, kj]
    if bias is not None:
        out += bias[None, :, None, None]
    return out.astype(np.float32)


def test_deform_conv2d_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    n, h, w = 1, 6, 7
    cin, cout, g, kh, kw = 8, 4, 2, 3, 3
    k = kh * kw
    x = rng.standard_normal((n, cin, h, w)).astype(np.float32)
    offset = (rng.standard_normal((n, 2 * g * k, h, w)) * 1.5).astype(np.float32)
    mask = rng.uniform(0, 1, (n, g * k, h, w)).astype(np.float32)
    weight = rng.standard_normal((cout, cin, kh, kw)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)

    ref = _np_deform_conv2d(x, offset, mask, weight, bias)

    # ours: NHWC / HWIO layouts; offset [N,H,W,G,K,2], mask [N,H,W,G,K]
    x_j = jnp.asarray(x.transpose(0, 2, 3, 1))
    off_j = jnp.asarray(
        offset.reshape(n, g, k, 2, h, w).transpose(0, 4, 5, 1, 2, 3)
    )
    mask_j = jnp.asarray(mask.reshape(n, g, k, h, w).transpose(0, 3, 4, 1, 2))
    w_j = jnp.asarray(weight.transpose(2, 3, 1, 0))
    out = np.asarray(deform_conv2d(x_j, off_j, mask_j, w_j, jnp.asarray(bias)))
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref, atol=1e-4, rtol=1e-4)


def test_binary_dilation_matches_scipy():
    rng = np.random.default_rng(1)
    m = (rng.uniform(size=(2, 20, 30)) > 0.95).astype(np.float32)
    for it in (1, 3, 8):
        ours = np.asarray(binary_dilation(jnp.asarray(m), it))
        for b in range(m.shape[0]):
            ref = scipy.ndimage.binary_dilation(m[b] > 0, iterations=it)
            np.testing.assert_array_equal(ours[b] > 0, ref)


def test_binarize():
    m = np.array([[0.05, 0.1, 0.11, 0.9]], dtype=np.float32)
    out = np.asarray(binarize(jnp.asarray(m)))
    np.testing.assert_array_equal(out, [[0, 0, 1, 1]])


def test_deform_conv_quad_matches_xla():
    """deform_conv2d_quad (one flat row-gather per sample over a
    quad-packed zero-padded grid; the env-opt-in PROPAINTER_TPU_DEFORM=
    quad alternative — measured 13x slower than the default Pallas tent
    kernel on v5e) == deform_conv2d_xla, including boundary-straddling
    and far out-of-bounds offsets."""
    import jax.numpy as jnp
    import numpy as np

    from comfyui_propainter_nodes_tpu.ops.deform_conv import (
        deform_conv2d_quad,
        deform_conv2d_xla,
    )

    rng = np.random.default_rng(3)
    n, h, w, c, g, cout = 2, 18, 26, 32, 4, 24
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    for scale in (0.5, 5.0, 40.0):
        off = jnp.asarray(
            rng.standard_normal((n, h, w, g, 9, 2)) * scale, jnp.float32
        )
        off = off.at[0, 0, 0].set(100.0)
        off = off.at[0, 1, 1].set(-100.0)
        mask = jnp.asarray(rng.uniform(0, 1, (n, h, w, g, 9)), jnp.float32)
        wgt = jnp.asarray(
            rng.standard_normal((3, 3, c, cout)) * 0.1, jnp.float32
        )
        b = jnp.asarray(rng.standard_normal(cout), jnp.float32)
        a = np.asarray(deform_conv2d_xla(x, off, mask, wgt, b))
        q = np.asarray(deform_conv2d_quad(x, off, mask, wgt, b))
        np.testing.assert_allclose(a, q, rtol=1e-5, atol=1e-4)
        oi = jnp.round(off)
        a = np.asarray(deform_conv2d_xla(x, oi, mask, wgt, b))
        q = np.asarray(deform_conv2d_quad(x, oi, mask, wgt, b))
        np.testing.assert_allclose(a, q, rtol=1e-5, atol=1e-4)
