"""Pallas window attention vs the XLA both-branch formulation."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from comfyui_propainter_nodes_tpu.ops.pallas.window_attention import (
    window_attention_pallas,
)


def _xla_reference(
    win_q, win_k, win_v, rolled_k, rolled_v, pool_k, pool_v,
    occ, bias_w, bias_r, bias_p, n_win_per_b,
):
    nw, nh, t, wsz, ch = win_q.shape
    b = nw // n_win_per_b
    scale = 1.0 / np.sqrt(ch)
    qa = win_q.reshape(nw, nh, t * wsz, ch)
    pool_b = jnp.broadcast_to(
        pool_k[:, None], (b, n_win_per_b) + pool_k.shape[1:]
    ).reshape(nw, nh, -1, ch)
    pool_vb = jnp.broadcast_to(
        pool_v[:, None], (b, n_win_per_b) + pool_v.shape[1:]
    ).reshape(nw, nh, -1, ch)
    k_all = jnp.concatenate(
        [win_k.reshape(nw, nh, t * wsz, ch), rolled_k, pool_b], axis=2
    )
    v_all = jnp.concatenate(
        [win_v.reshape(nw, nh, t * wsz, ch), rolled_v, pool_vb], axis=2
    )
    bias = jnp.concatenate([bias_w, bias_r, bias_p], axis=1)  # [B, Ktot]
    bias_per_win = jnp.repeat(bias, n_win_per_b, axis=0)[:, None, None]  # [W,1,1,K]
    att_a = jnp.einsum("whqc,whkc->whqk", qa, k_all) * scale + bias_per_win
    out_a = jnp.einsum("whqk,whkc->whqc", jax.nn.softmax(att_a, -1), v_all)
    out_a = out_a.reshape(nw, nh, t, wsz, ch)
    att_b = jnp.einsum("whtqc,whtkc->whtqk", win_q, win_k) * scale
    out_b = jnp.einsum("whtqk,whtkc->whtqc", jax.nn.softmax(att_b, -1), win_v)
    return jnp.where(occ[:, None, None, None, None], out_a, out_b)


def test_pallas_window_attention_matches_xla():
    rng = np.random.default_rng(0)
    b, nwb, nh, t, wsz, ch = 2, 3, 2, 4, 8, 16
    nw = b * nwb
    tsel, nroll, pp = 2, 5, 6
    f32 = np.float32
    win_q = jnp.asarray(rng.standard_normal((nw, nh, t, wsz, ch)).astype(f32))
    win_k = jnp.asarray(rng.standard_normal((nw, nh, t, wsz, ch)).astype(f32))
    win_v = jnp.asarray(rng.standard_normal((nw, nh, t, wsz, ch)).astype(f32))
    rolled_k = jnp.asarray(rng.standard_normal((nw, nh, tsel * nroll, ch)).astype(f32))
    rolled_v = jnp.asarray(rng.standard_normal((nw, nh, tsel * nroll, ch)).astype(f32))
    pool_k = jnp.asarray(rng.standard_normal((b, nh, tsel * pp, ch)).astype(f32))
    pool_v = jnp.asarray(rng.standard_normal((b, nh, tsel * pp, ch)).astype(f32))
    occ = jnp.asarray([True, False, True, False, False, True])
    # per-batch biases; window-key bias carries the t_ind subset (frames
    # 0 and 2 selected), second batch row also drops frame 2
    bias_w = jnp.stack(
        [
            jnp.repeat(jnp.asarray([0.0, -1e9, 0.0, -1e9]), wsz),
            jnp.repeat(jnp.asarray([0.0, -1e9, -1e9, -1e9]), wsz),
        ]
    )
    bias_r = jnp.stack(
        [
            jnp.where(jnp.arange(tsel * nroll) % 7 == 3, -1e9, 0.0),
            jnp.where(jnp.arange(tsel * nroll) % 5 == 1, -1e9, 0.0),
        ]
    )
    bias_p = jnp.zeros((b, tsel * pp), jnp.float32)

    ref = _xla_reference(
        win_q, win_k, win_v, rolled_k, rolled_v, pool_k, pool_v,
        occ, bias_w, bias_r, bias_p, nwb,
    )
    with pltpu.force_tpu_interpret_mode():
        out = window_attention_pallas(
            win_q, win_k, win_v, rolled_k, rolled_v, pool_k, pool_v,
            occ, bias_w, bias_r, bias_p, n_win_per_b=nwb, k_tile=16,
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_sparse_window_attention_pallas_path_matches_xla_path():
    """End-to-end sparse_window_attention: kernel path == fallback path
    (same weights, same inputs, t_ind subset + padded frames)."""
    from comfyui_propainter_nodes_tpu.ops import attention as att
    from comfyui_propainter_nodes_tpu.ops import deform_conv as dc

    rng = np.random.default_rng(3)
    b, t, h, w, c, n_head = 1, 4, 10, 18, 32, 4
    l_t = 2
    f32 = np.float32
    p = {}
    for name in ("query", "key", "value", "proj"):
        p[f"a.{name}.weight"] = jnp.asarray(rng.standard_normal((c, c)).astype(f32) * 0.1)
        p[f"a.{name}.bias"] = jnp.asarray(rng.standard_normal((c,)).astype(f32) * 0.1)
    p["a.pool_layer.weight"] = jnp.asarray(
        rng.standard_normal((4, 4, 1, c)).astype(f32) * 0.1
    )
    p["a.pool_layer.bias"] = jnp.asarray(rng.standard_normal((c,)).astype(f32) * 0.1)

    x = jnp.asarray(rng.standard_normal((b, t, h, w, c)).astype(f32))
    mask = jnp.zeros((b, l_t, h, w, 1)).at[:, :, 2:5, 3:9].set(1.0)
    t_ind = np.arange(0, t, 2)
    tv = jnp.asarray([True, True, True, False])

    old = dc._USE_PALLAS
    try:
        dc._USE_PALLAS = False
        ref = att.sparse_window_attention(
            p, "a", x, mask, t_ind, n_head=n_head, t_valid_mask=tv
        )
        dc._USE_PALLAS = True
        with pltpu.force_tpu_interpret_mode():
            out = att.sparse_window_attention(
                p, "a", x, mask, t_ind, n_head=n_head, t_valid_mask=tv
            )
    finally:
        dc._USE_PALLAS = old
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_tiled_kernel_matches_single(monkeypatch):
    """The segment-tiled kernel (bounded VMEM for 720p+) must equal the
    single-pass kernel: flash state carried in scratch across segment
    tiles, -1e9-biased tile padding, query-row-tiled clean branch."""
    import numpy as np
    import jax.numpy as jnp

    from comfyui_propainter_nodes_tpu.ops.pallas import window_attention as wa

    rng = np.random.default_rng(8)
    n_win_per_b, b, n_head, t, wsz, ch = 4, 2, 2, 5, 9, 32
    w = b * n_win_per_b
    qt = t * wsz
    rl, pl_len = 100, 70  # NOT SEG_TILE multiples: exercises pad path
    f32 = np.float32
    win_q = jnp.asarray(rng.standard_normal((w, n_head, t, wsz, ch)).astype(f32))
    win_k = jnp.asarray(rng.standard_normal((w, n_head, t, wsz, ch)).astype(f32))
    win_v = jnp.asarray(rng.standard_normal((w, n_head, t, wsz, ch)).astype(f32))
    rk = jnp.asarray(rng.standard_normal((w, n_head, rl, ch)).astype(f32))
    rv = jnp.asarray(rng.standard_normal((w, n_head, rl, ch)).astype(f32))
    pk = jnp.asarray(rng.standard_normal((b, n_head, pl_len, ch)).astype(f32))
    pv = jnp.asarray(rng.standard_normal((b, n_head, pl_len, ch)).astype(f32))
    occ = jnp.asarray(rng.integers(0, 2, (w,)).astype(np.int32))
    bias_w = jnp.asarray(
        np.where(rng.uniform(size=(b, qt)) > 0.3, 0.0, -1e9).astype(f32)
    )
    bias_r = jnp.asarray(
        np.where(rng.uniform(size=(b, rl)) > 0.3, 0.0, -1e9).astype(f32)
    )
    bias_p = jnp.asarray(
        np.where(rng.uniform(size=(b, pl_len)) > 0.3, 0.0, -1e9).astype(f32)
    )
    # small SEG_TILE so the segments genuinely span multiple tiles
    monkeypatch.setattr(wa, "SEG_TILE", 64)

    from jax.experimental.pallas import tpu as pltpu

    args = (win_q, win_k, win_v, rk, rv, pk, pv, occ, bias_w, bias_r, bias_p)
    with pltpu.force_tpu_interpret_mode():
        ref = np.asarray(
            wa._window_attention_single(*args, n_win_per_b=n_win_per_b)
        )
        out = np.asarray(
            wa._window_attention_tiled(*args, n_win_per_b=n_win_per_b)
        )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_halo_attention_layer_matches_xla():
    """The fused token-grid (halo) kernel vs the XLA both-branch layer:
    padded grids, t_ind subset, padded-frame validity, mixed clean/
    occupied windows."""
    import os

    from comfyui_propainter_nodes_tpu.ops import attention as att
    from comfyui_propainter_nodes_tpu.ops import deform_conv as _dc
    from comfyui_propainter_nodes_tpu.utils.weights import random_params

    rng = np.random.default_rng(11)
    b, t, fh, fw, c = 2, 6, 12, 20, 512  # pads to (15, 27) token grid
    l_t = 4
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
    mask = jnp.zeros((b, l_t, fh, fw, 1)).at[:, :, 3:7, 4:12].set(1.0)
    t_ind = np.arange(0, t, 2)
    tv = jnp.asarray([True] * 5 + [False])

    ref = att.sparse_window_attention(
        p, pre, x, mask, t_ind, t_valid_mask=tv
    )

    prev = _dc._USE_PALLAS
    _dc._USE_PALLAS = True
    os.environ["PROPAINTER_TPU_ATTN"] = "halo"
    try:
        with pltpu.force_tpu_interpret_mode():
            out = att.sparse_window_attention(
                p, pre, x, mask, t_ind, t_valid_mask=tv
            )
    finally:
        _dc._USE_PALLAS = prev
        os.environ.pop("PROPAINTER_TPU_ATTN", None)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3
    )


def test_halo_attention_multi_chunk_pooled():
    """A token grid large enough that the pooled segment spans >1 DMA
    chunk (the 720p+ regime the chunking exists for)."""
    import os

    from comfyui_propainter_nodes_tpu.ops import attention as att
    from comfyui_propainter_nodes_tpu.ops import deform_conv as _dc
    from comfyui_propainter_nodes_tpu.utils.weights import random_params

    rng = np.random.default_rng(17)
    b, t, fh, fw, c = 1, 8, 40, 56, 512  # pool grid 10x14 x 8 sel frames
    l_t = 5
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
    mask = jnp.zeros((b, l_t, fh, fw, 1)).at[:, :, 10:20, 15:35].set(1.0)

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
