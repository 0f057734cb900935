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
