"""Pallas window attention vs the XLA both-branch formulation."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from comfyui_propainter_nodes_tpu.ops.pallas.window_attention import (
    window_attention_pallas,
)


def _xla_reference(win_q, k_sel, v_sel, win_k, win_v, occ, key_bias):
    nw, nh, t, wsz, ch = win_q.shape
    scale = 1.0 / np.sqrt(ch)
    qa = win_q.reshape(nw, nh, t * wsz, ch)
    att_a = jnp.einsum("whqc,whkc->whqk", qa, k_sel) * scale + key_bias
    out_a = jnp.einsum("whqk,whkc->whqc", jax.nn.softmax(att_a, -1), v_sel)
    out_a = out_a.reshape(nw, nh, t, wsz, ch)
    att_b = jnp.einsum("whtqc,whtkc->whtqk", win_q, win_k) * scale
    out_b = jnp.einsum("whtqk,whtkc->whtqc", jax.nn.softmax(att_b, -1), win_v)
    return jnp.where(occ[:, None, None, None, None], out_a, out_b)


def test_pallas_window_attention_matches_xla():
    rng = np.random.default_rng(0)
    nw, nh, t, wsz, ch = 4, 2, 3, 8, 16
    ksel = t * (wsz + 5)
    win_q = jnp.asarray(rng.standard_normal((nw, nh, t, wsz, ch)).astype(np.float32))
    k_sel = jnp.asarray(rng.standard_normal((nw, nh, ksel, ch)).astype(np.float32))
    v_sel = jnp.asarray(rng.standard_normal((nw, nh, ksel, ch)).astype(np.float32))
    win_k = jnp.asarray(rng.standard_normal((nw, nh, t, wsz, ch)).astype(np.float32))
    win_v = jnp.asarray(rng.standard_normal((nw, nh, t, wsz, ch)).astype(np.float32))
    occ = jnp.asarray([True, False, True, False])
    key_bias = jnp.where(jnp.arange(ksel) % 7 == 3, -1e9, 0.0)

    ref = _xla_reference(win_q, k_sel, v_sel, win_k, win_v, occ, key_bias)
    with pltpu.force_tpu_interpret_mode():
        out = window_attention_pallas(
            win_q, k_sel, v_sel, win_k, win_v, occ, key_bias, k_tile=16
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
