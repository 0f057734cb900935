"""Pallas kernels vs their XLA twins (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from comfyui_propainter_nodes_tpu.ops.deform_conv import deform_conv2d_xla as deform_conv2d
from comfyui_propainter_nodes_tpu.ops.pallas.deform_conv import deform_conv2d_pallas


def test_pallas_deform_conv_matches_xla():
    rng = np.random.default_rng(0)
    n, h, w = 2, 10, 12
    cin, cout, g = 16, 8, 4
    x = jnp.asarray(rng.standard_normal((n, h, w, cin)).astype(np.float32))
    off = jnp.asarray((rng.standard_normal((n, h, w, g, 9, 2)) * 2).astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 1, (n, h, w, g, 9)).astype(np.float32))
    wgt = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))

    ref = deform_conv2d(x, off, mask, wgt, bias)
    with pltpu.force_tpu_interpret_mode():
        out = deform_conv2d_pallas(x, off, mask, wgt, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_pallas_deform_conv_oob_zero_padding():
    """Offsets pushing every tap out of bounds must give bias-only output."""
    n, h, w, cin, cout, g = 1, 6, 8, 8, 4, 2
    x = jnp.ones((n, h, w, cin))
    off = jnp.full((n, h, w, g, 9, 2), 100.0)
    mask = jnp.ones((n, h, w, g, 9))
    wgt = jnp.ones((3, 3, cin, cout))
    bias = jnp.full((cout,), 7.0)
    with pltpu.force_tpu_interpret_mode():
        out = deform_conv2d_pallas(x, off, mask, wgt, bias)
    np.testing.assert_allclose(np.asarray(out), 7.0, atol=1e-6)


def test_pallas_corr_window_lookup_matches_slice_gather():
    from comfyui_propainter_nodes_tpu.ops.pallas.corr_lookup import (
        corr_window_lookup_pallas,
    )

    rng = np.random.default_rng(1)
    m, hp, wp = 300, 40, 50
    corr = jnp.asarray(rng.standard_normal((m, hp, wp)).astype(np.float32))
    sy = jnp.asarray(rng.integers(0, hp - 10, m).astype(np.int32))
    sx = jnp.asarray(rng.integers(0, wp - 10, m).astype(np.int32))
    fy = jnp.asarray(rng.uniform(0, 1, m).astype(np.float32))
    fx = jnp.asarray(rng.uniform(0, 1, m).astype(np.float32))

    win = jax.vmap(lambda mm, a, b: jax.lax.dynamic_slice(mm, (a, b), (10, 10)))(
        corr, sy, sx
    )
    vy = win[:, :9, :] * (1 - fy)[:, None, None] + win[:, 1:, :] * fy[:, None, None]
    ref = vy[:, :, :9] * (1 - fx)[:, None, None] + vy[:, :, 1:] * fx[:, None, None]

    with pltpu.force_tpu_interpret_mode():
        out = corr_window_lookup_pallas(corr, sy, sx, fy, fx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_fused4_corr_lookup_matches_slice_gather():
    from comfyui_propainter_nodes_tpu.ops.pallas.corr_lookup import (
        corr_window_lookup4_pallas,
    )

    rng = np.random.default_rng(2)
    m = 300
    pyr, sys_, sxs, fys, fxs, refs = [], [], [], [], [], []
    for hp, wp in [(40, 50), (28, 34), (22, 26), (20, 22)]:
        c = jnp.asarray(rng.standard_normal((m, hp, wp)).astype(np.float32))
        pyr.append(c)
        sy = rng.integers(0, hp - 10, m).astype(np.int32)
        sx = rng.integers(0, wp - 10, m).astype(np.int32)
        fy = rng.uniform(0, 1, m).astype(np.float32)
        fx = rng.uniform(0, 1, m).astype(np.float32)
        sys_.append(sy), sxs.append(sx), fys.append(fy), fxs.append(fx)
        win = jax.vmap(
            lambda mm, a, b: jax.lax.dynamic_slice(mm, (a, b), (10, 10))
        )(c, jnp.asarray(sy), jnp.asarray(sx))
        vy = win[:, :9, :] * (1 - fy)[:, None, None] + win[:, 1:, :] * fy[:, None, None]
        refs.append(
            vy[:, :, :9] * (1 - fx)[:, None, None] + vy[:, :, 1:] * fx[:, None, None]
        )
    with pltpu.force_tpu_interpret_mode():
        out = corr_window_lookup4_pallas(
            pyr,
            jnp.asarray(np.stack(sys_)),
            jnp.asarray(np.stack(sxs)),
            jnp.asarray(np.stack(fys)),
            jnp.asarray(np.stack(fxs)),
        )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.stack(refs, 1)), atol=1e-5
    )


def test_window_lookup_einsum_matches_slice_gather():
    from comfyui_propainter_nodes_tpu.models.raft import _window_lookup_einsum

    rng = np.random.default_rng(5)
    m, hp, wp = 300, 40, 50
    corr = jnp.asarray(rng.standard_normal((m, hp, wp)).astype(np.float32))
    sy = jnp.asarray(rng.integers(0, hp - 10, m).astype(np.int32))
    sx = jnp.asarray(rng.integers(0, wp - 10, m).astype(np.int32))
    fy = jnp.asarray(rng.uniform(0, 1, m).astype(np.float32))
    fx = jnp.asarray(rng.uniform(0, 1, m).astype(np.float32))

    win = jax.vmap(lambda mm, a, b: jax.lax.dynamic_slice(mm, (a, b), (10, 10)))(
        corr, sy, sx
    )
    vy = win[:, :9, :] * (1 - fy)[:, None, None] + win[:, 1:, :] * fy[:, None, None]
    ref = vy[:, :, :9] * (1 - fx)[:, None, None] + vy[:, :, 1:] * fx[:, None, None]

    out = _window_lookup_einsum(corr, sy, sx, fy, fx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_corr_lanes_matches_einsum_lookup():
    """Pixels-on-lanes lookup vs the XLA one-hot einsum oracle: same
    4-level pyramid, same coords, identical (level, dx, dy) channels."""
    from comfyui_propainter_nodes_tpu.models.raft import (
        build_corr_pyramid_bi,
        lookup_corr,
    )
    from comfyui_propainter_nodes_tpu.ops.pallas.corr_lanes import (
        build_corr_pyramid_bi_lanes,
        corr_lookup_lanes,
    )

    rng = np.random.default_rng(3)
    n, h8, w8, c = 2, 17, 24, 8  # odd height exercises pool tails + row pad
    f1 = jnp.asarray(rng.standard_normal((n, h8, w8, c)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((n, h8, w8, c)).astype(np.float32))
    # coords: base grid + moderate flow, some windows partially OOB
    yy, xx = np.mgrid[0:h8, 0:w8].astype(np.float32)
    base = np.stack([xx, yy], axis=-1)[None]
    flow = (rng.standard_normal((2 * n, h8, w8, 2)) * 3.0).astype(np.float32)
    coords = jnp.asarray(np.broadcast_to(base, (2 * n, h8, w8, 2)) + flow)

    ref_pyr = build_corr_pyramid_bi(f1, f2, pad=False)
    ref = lookup_corr(ref_pyr, coords, padded=False)  # einsum path needs...
    # lookup_corr's einsum branch is gated on _pallas_enabled; call the
    # internal einsum helper shape directly via the dynamic-slice path
    # oracle instead: pad=False falls back to padding + slices, which is
    # the exact-semantics oracle.

    lanes_pyr = build_corr_pyramid_bi_lanes(f1, f2)
    with pltpu.force_tpu_interpret_mode():
        out = corr_lookup_lanes(lanes_pyr, coords)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4
    )


def test_pallas_deform_conv_bf16_and_odd_groups():
    """bf16 operands + a (g=2, cg=4) grouping and non-tile-aligned HW:
    the dynamic-row-window kernel must match the XLA oracle within bf16
    tolerance."""
    rng = np.random.default_rng(7)
    n, h, w = 1, 23, 31  # hw = 713: pads the pixel tile
    cin, cout, g = 8, 16, 2
    x = rng.standard_normal((n, h, w, cin)).astype(np.float32)
    off = (rng.standard_normal((n, h, w, g, 9, 2)) * 4).astype(np.float32)
    mask = rng.uniform(0, 1, (n, h, w, g, 9)).astype(np.float32)
    wgt = (rng.standard_normal((3, 3, cin, cout)) * 0.2).astype(np.float32)

    ref = deform_conv2d(
        jnp.asarray(x), jnp.asarray(off), jnp.asarray(mask),
        jnp.asarray(wgt), None,
    )
    with pltpu.force_tpu_interpret_mode():
        out = deform_conv2d_pallas(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(off, jnp.bfloat16),
            jnp.asarray(mask, jnp.bfloat16), jnp.asarray(wgt, jnp.bfloat16),
            None,
        )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.15, rtol=0.1
    )


def test_pallas_corr_lanes_all_oob_coords():
    """Windows fully out of range must contribute exact zeros (the
    grid_sample 'zeros' semantics the tent weights encode)."""
    from comfyui_propainter_nodes_tpu.ops.pallas.corr_lanes import (
        build_corr_pyramid_bi_lanes,
        corr_lookup_lanes,
    )

    rng = np.random.default_rng(9)
    n, h8, w8, c = 1, 16, 24, 8
    f1 = jnp.asarray(rng.standard_normal((n, h8, w8, c)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((n, h8, w8, c)).astype(np.float32))
    coords = jnp.full((2 * n, h8, w8, 2), -50.0)  # far outside every level

    pyr = build_corr_pyramid_bi_lanes(f1, f2)
    with pltpu.force_tpu_interpret_mode():
        out = corr_lookup_lanes(pyr, coords)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_halo_attention_all_clean_and_no_tind():
    """All-clean windows (halo DMA never issued) and t_ind=None: the
    fused kernel must still match the XLA layer."""
    import os

    from comfyui_propainter_nodes_tpu.ops import attention as att
    from comfyui_propainter_nodes_tpu.ops import deform_conv as _dc
    from comfyui_propainter_nodes_tpu.utils.weights import random_params

    rng = np.random.default_rng(13)
    b, t, fh, fw, c = 1, 4, 10, 18, 512
    l_t = 3
    full = random_params("inpaint_generator")
    p = {
        k: jnp.asarray(v)
        for k, v in full.items()
        if k.startswith("transformers.transformer.0.attention")
    }
    pre = "transformers.transformer.0.attention"
    x = jnp.asarray(
        rng.standard_normal((b, t, fh, fw, c)).astype(np.float32) * 0.1
    )
    mask = jnp.zeros((b, l_t, fh, fw, 1))  # every window clean

    ref = att.sparse_window_attention(p, pre, x, mask, None)

    prev = _dc._USE_PALLAS
    _dc._USE_PALLAS = True
    os.environ["PROPAINTER_TPU_ATTN"] = "halo"
    try:
        with pltpu.force_tpu_interpret_mode():
            out = att.sparse_window_attention(p, pre, x, mask, None)
    finally:
        _dc._USE_PALLAS = prev
        os.environ.pop("PROPAINTER_TPU_ATTN", None)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3
    )
