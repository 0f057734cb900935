"""Thin conv/linear/norm wrappers over lax.conv_general_dilated, NHWC/HWIO.

All model weights live in a flat {torch_state_dict_key: array} pytree with
layouts already converted for TPU (conv OIHW->HWIO, conv3d OIDHW->DHWIO,
linear (out,in)->(in,out)); see utils/checkpoint.py. These helpers fetch
"<name>.weight"/"<name>.bias" so model code reads like the layer list it
implements.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp

Params = Mapping[str, jnp.ndarray]


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: tuple[int, int] = (1, 1),
    padding: tuple[int, int] = (0, 0),
    dilation: tuple[int, int] = (1, 1),
    groups: int = 1,
) -> jnp.ndarray:
    """x: [N, H, W, Cin], w: [kh, kw, Cin/groups, Cout] -> [N, H', W', Cout]."""
    ph, pw = padding
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def conv3d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: tuple[int, int, int] = (1, 1, 1),
    padding: tuple[int, int, int] = (0, 0, 0),
    dilation: tuple[int, int, int] = (1, 1, 1),
) -> jnp.ndarray:
    """x: [N, T, H, W, Cin], w: [kt, kh, kw, Cin, Cout]."""
    pt, ph, pw = padding
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=((pt, pt), (ph, ph), (pw, pw)),
        rhs_dilation=dilation,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def pconv2d(p: Params, name: str, x: jnp.ndarray, **kw) -> jnp.ndarray:
    return conv2d(x, p[name + ".weight"], p.get(name + ".bias"), **kw)


def pconv3d(p: Params, name: str, x: jnp.ndarray, **kw) -> jnp.ndarray:
    """conv3d with TPU-friendly decomposition for the two shapes the
    models actually use: (1, k, k) spatial kernels run as batched 2D
    convs (T folded into batch), (kt, 1, 1) temporal kernels run as a
    sum of time-shifted 1x1 matmuls — XLA's generic 3D conv path tiles
    poorly on the MXU."""
    w = p[name + ".weight"]
    b = p.get(name + ".bias")
    kt, kh, kw_, cin, cout = w.shape
    stride = kw.get("stride", (1, 1, 1))
    padding = kw.get("padding", (0, 0, 0))
    dilation = kw.get("dilation", (1, 1, 1))
    if kt == 1 and stride[0] == 1 and padding[0] == 0:
        n, t, h, ww, c = x.shape
        y = conv2d(
            x.reshape(n * t, h, ww, c),
            w[0],
            b,
            stride=stride[1:],
            padding=padding[1:],
            dilation=dilation[1:],
        )
        return y.reshape(n, t, y.shape[1], y.shape[2], cout)
    if kh == 1 and kw_ == 1 and stride == (1, 1, 1) and padding[1:] == (0, 0):
        dt_ = dilation[0]
        n, t, h, ww, c = x.shape
        out = None
        for j in range(kt):
            shift = j * dt_ - padding[0]
            wj = w[j, 0, 0].astype(x.dtype)  # [cin, cout]
            if shift < 0:
                seg = jnp.pad(x[:, : t + shift], ((0, 0), (-shift, 0)) + ((0, 0),) * 3)
            elif shift > 0:
                seg = jnp.pad(x[:, shift:], ((0, 0), (0, shift)) + ((0, 0),) * 3)
            else:
                seg = x
            term = jnp.matmul(seg, wj)
            out = term if out is None else out + term
        if b is not None:
            out = out + b.astype(x.dtype)
        return out
    return conv3d(x, w, b, **kw)


def linear(p: Params, name: str, x: jnp.ndarray) -> jnp.ndarray:
    """x: [..., in]; weight stored as [in, out]."""
    out = jnp.matmul(x, p[name + ".weight"].astype(x.dtype))
    b = p.get(name + ".bias")
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, negative_slope * x)


def layer_norm(p: Params, name: str, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    return xn * p[name + ".weight"].astype(x.dtype) + p[name + ".bias"].astype(x.dtype)


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=False, track_running_stats=False): per-sample,
    per-channel normalization over H, W (RAFT fnet; extractor.py:30-33)."""
    mu = jnp.mean(x, axis=(-3, -2), keepdims=True)
    var = jnp.var(x, axis=(-3, -2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def batch_norm_eval(p: Params, name: str, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """BatchNorm2d in eval mode: normalize with stored running stats."""
    rm = p[name + ".running_mean"].astype(x.dtype)
    rv = p[name + ".running_var"].astype(x.dtype)
    w = p[name + ".weight"].astype(x.dtype)
    b = p[name + ".bias"].astype(x.dtype)
    return (x - rm) * jax.lax.rsqrt(rv + eps) * w + b
