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

    Phase-decomposed for HBM bandwidth: a padded-canvas pixel at position
    sh*q + a (phase a of the stride) receives only the taps ki = a + sh*d,
    so each of the sh*sw phases is a sum of <= ceil(kh/sh)*ceil(kw/sw)
    patch planes at TOKEN resolution, and the full canvas is written once
    by interleaving the phases (a reshape). The naive per-tap dilated
    overlap-add touches the full canvas kh*kw times (~13 GB of traffic for
    FusionFeedForward's 40-channel fold at 640x360); this touches the
    canvas once plus kh*kw token-sized planes, ~10x less.
    """
    n, oh, ow, kh, kw, c = patches.shape
    h, w = output_size
    (sh, sw), (ph, pw) = stride, padding
    dh, dw = -(-kh // sh), -(-kw // sw)  # taps per phase, per dim
    qh, qw = oh - 1 + dh, ow - 1 + dw  # phase-canvas (token-ish) size
    phases = []
    for a in range(sh):
        for b in range(sw):
            acc = None
            for d1 in range(dh):
                ki = a + sh * d1
                if ki >= kh:
                    continue
                for d2 in range(dw):
                    kj = b + sw * d2
                    if kj >= kw:
                        continue
                    plane = jnp.pad(
                        patches[:, :, :, ki, kj, :],
                        (
                            (0, 0),
                            (d1, qh - oh - d1),
                            (d2, qw - ow - d2),
                            (0, 0),
                        ),
                    )
                    acc = plane if acc is None else acc + plane
            if acc is None:
                acc = jnp.zeros((n, qh, qw, c), patches.dtype)
            phases.append(acc)
    # interleave: out_padded[n, sh*q + a, sw*r + b, c] = phases[a*sw+b][n,q,r,c]
    out = jnp.stack(phases, axis=0).reshape(sh, sw, n, qh, qw, c)
    out = out.transpose(2, 3, 0, 4, 1, 5).reshape(n, qh * sh, qw * sw, c)
    pad_h = max(0, ph + h - qh * sh)
    pad_w = max(0, pw + w - qw * sw)
    if pad_h or pad_w:
        out = jnp.pad(out, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
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
