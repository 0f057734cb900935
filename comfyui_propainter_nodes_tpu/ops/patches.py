"""Overlapping-patch (un)tokenization: unfold / fold, NHWC.

TPU-native replacement for ATen `F.unfold` / `F.fold` as used by the
reference's SoftSplit / SoftComp / FusionFeedForward
(model/modules/sparse_transformer.py:14,56-62,95-121) and RAFT's convex
flow upsampling (model/modules/RAFT/raft.py:87).

unfold is a stack of kh*kw strided slices (static; XLA fuses into one
gather-free program); fold is its exact adjoint built from strided
scatter-adds with static indices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _out_size(size: int, k: int, s: int, p: int) -> int:
    return (size + 2 * p - (k - 1) - 1) // s + 1


def unfold(
    x: jnp.ndarray,
    kernel_size: tuple[int, int],
    stride: tuple[int, int],
    padding: tuple[int, int],
) -> jnp.ndarray:
    """Extract sliding local patches.

    x: [N, H, W, C]  ->  [N, oh, ow, kh, kw, C]

    The flattened (kh, kw, C) ordering differs from torch's channel-major
    (C, kh, kw); use `unfold_torch_layout` when parity with a torch
    state-dict weight layout matters.
    """
    n, h, w, c = x.shape
    (kh, kw), (sh, sw), (ph, pw) = kernel_size, stride, padding
    oh = _out_size(h, kh, sh, ph)
    ow = _out_size(w, kw, sw, pw)
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    rows = []
    for ki in range(kh):
        cols = []
        for kj in range(kw):
            sl = xp[:, ki : ki + sh * (oh - 1) + 1 : sh, kj : kj + sw * (ow - 1) + 1 : sw, :]
            cols.append(sl)
        rows.append(jnp.stack(cols, axis=3))  # [N, oh, ow, kw, C]
    return jnp.stack(rows, axis=3)  # [N, oh, ow, kh, kw, C]


def fold(
    patches: jnp.ndarray,
    output_size: tuple[int, int],
    kernel_size: tuple[int, int],
    stride: tuple[int, int],
    padding: tuple[int, int],
) -> jnp.ndarray:
    """Adjoint of `unfold`: overlap-add patches back onto the canvas.

    patches: [N, oh, ow, kh, kw, C]  ->  [N, H, W, C]
    """
    n, oh, ow, kh, kw, c = patches.shape
    h, w = output_size
    (sh, sw), (ph, pw) = stride, padding
    hp, wp = h + 2 * ph, w + 2 * pw
    # Each tap (ki, kj) contributes its patch plane on a stride-dilated
    # grid offset by (ki, kj). lax.pad with interior padding expresses the
    # dilation + offset as ONE dense op per tap (no XLA scatters, which
    # are slow to compile and run on TPU).
    zero = jnp.asarray(0, patches.dtype)
    out = None
    for ki in range(kh):
        lo_h = ki
        hi_h = hp - (ki + sh * (oh - 1) + 1)
        for kj in range(kw):
            lo_w = kj
            hi_w = wp - (kj + sw * (ow - 1) + 1)
            plane = jax.lax.pad(
                patches[:, :, :, ki, kj, :],
                zero,
                (
                    (0, 0, 0),
                    (lo_h, hi_h, sh - 1),
                    (lo_w, hi_w, sw - 1),
                    (0, 0, 0),
                ),
            )
            out = plane if out is None else out + plane
    return out[:, ph : ph + h, pw : pw + w, :]


def fold_normalizer(
    n_tokens_hw: tuple[int, int],
    output_size: tuple[int, int],
    kernel_size: tuple[int, int],
    stride: tuple[int, int],
    padding: tuple[int, int],
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Per-pixel overlap count: fold(ones). [H, W, 1].

    Used by FusionFeedForward's overlap re-normalization
    (model/modules/sparse_transformer.py:90-101); depends only on static
    geometry so it is constant-folded under jit.
    """
    oh, ow = n_tokens_hw
    kh, kw = kernel_size
    ones = jnp.ones((1, oh, ow, kh, kw, 1), dtype=dtype)
    return fold(ones, output_size, kernel_size, stride, padding)[0]
