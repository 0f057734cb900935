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
    """x: [N, H, W, Cin], w: [kh, kw, Cin/groups, Cout] -> [N, H', W', Cout].

    Strided convs (ungrouped, undilated) run via space-to-depth phase
    decomposition: XLA's strided conv windows tile poorly onto the MXU
    (measured 13 TFLOP/s on the encoder's 3x3/s2 layers vs ~200 for the
    equivalent dense matmul); regrouping the input into stride-phase
    channels turns them into stride-1 convs with a deep, MXU-shaped
    contraction. Identical tap set per output pixel (zeros padding
    preserved), so numerics match up to fp reassociation."""
    if (
        (stride[0] > 1 or stride[1] > 1)
        and groups == 1
        and dilation == (1, 1)
        and w.shape[0] <= 8
        and w.shape[1] <= 8
    ):
        return _conv2d_phase_strided(x, w, b, stride, padding)
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


def _conv2d_phase_strided(x, w, b, stride, padding):
    """stride-(sh,sw) conv == stride-1 conv over the space-to-depth input.

    Tap i of the original kernel reads input row sh*y + i - ph; writing
    i - ph = sh*d + a (a in [0, sh)) maps it to tap d of a dense conv
    over phase-a channels. The (i -> (d, a)) map is a bijection, so the
    output pixel sums exactly the same taps."""
    sh, sw = stride
    kh, kw, cin, cout = w.shape
    ph, pw = padding
    n, h, win, _ = x.shape
    out_h = (h + 2 * ph - kh) // sh + 1
    out_w = (win + 2 * pw - kw) // sw + 1

    h2 = -(-h // sh)
    w2 = -(-win // sw)
    if h2 * sh != h or w2 * sw != win:
        x = jnp.pad(x, ((0, 0), (0, h2 * sh - h), (0, w2 * sw - win), (0, 0)))
    xs = x.reshape(n, h2, sh, w2, sw, cin)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, h2, w2, sh * sw * cin)

    dmin_h = (-ph) // sh  # python floordiv floors negatives
    dmin_w = (-pw) // sw
    dmax_h = (kh - 1 - ph) // sh
    dmax_w = (kw - 1 - pw) // sw
    kh2 = dmax_h - dmin_h + 1
    kw2 = dmax_w - dmin_w + 1
    w2k = jnp.zeros((kh2, kw2, sh, sw, cin, cout), w.dtype)
    ii = jnp.arange(kh)
    jj = jnp.arange(kw)
    d_i = (ii - ph) // sh - dmin_h
    a_i = (ii - ph) % sh
    d_j = (jj - pw) // sw - dmin_w
    a_j = (jj - pw) % sw
    w2k = w2k.at[d_i[:, None], d_j[None, :], a_i[:, None], a_j[None, :]].set(
        w.reshape(kh, kw, cin, cout)
    )
    w2k = w2k.reshape(kh2, kw2, sh * sw * cin, cout)

    # out_len = h2 + pad_t + pad_b - kh2 + 1  =>  pad_b = out_h - h2 + dmax_h
    pad_t = -dmin_h
    pad_b = out_h - h2 + dmax_h
    pad_l = -dmin_w
    pad_r = out_w - w2 + dmax_w
    out = jax.lax.conv_general_dilated(
        xs,
        w2k.astype(x.dtype),
        window_strides=(1, 1),
        padding=((pad_t, pad_b), (pad_l, pad_r)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
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
        # OUTPUT-shifted accumulation: out[t] = sum_j (x @ Wj)[t+shift_j]
        # — same products and add order as shifting the INPUT per tap
        # (bit-identical), but the shift/pad now applies to the matmul
        # RESULT, where it fuses into the accumulating elementwise op.
        # The input-shifted form materialized a slice AND a pad copy of
        # the [N,T,H,W,C] activation per tap next to the conv output —
        # three ~4GB buffers at 1080p completion-encoder chunks, the
        # allocations the config-5 compile OOM report pinned to this
        # line (low-channel full-res activations pad 4x: C=32 rounds to
        # the 128-lane tile).
        out = None
        for j in range(kt):
            shift = j * dt_ - padding[0]
            wj = w[j, 0, 0].astype(x.dtype)  # [cin, cout]
            term = jnp.matmul(x, wj)
            if shift < 0:
                seg = jnp.pad(
                    term[:, : t + shift], ((0, 0), (-shift, 0)) + ((0, 0),) * 3
                )
            elif shift > 0:
                seg = jnp.pad(
                    term[:, shift:], ((0, 0), (0, shift)) + ((0, 0),) * 3
                )
            else:
                seg = term
            out = seg if out is None else out + seg
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
