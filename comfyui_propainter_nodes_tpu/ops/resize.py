"""Exact-semantics image resizing (separable gathers, NHWC).

The reference relies on torch `F.interpolate` in three distinct flavours:
  * bilinear align_corners=True   (decoders: model/propainter.py:290,
    model/recurrent_flow_completion.py:158; RAFT upflow8:
    model/modules/RAFT/utils/utils.py:89-91)
  * bilinear align_corners=False  (flow downsampling: model/propainter.py:391-408)
  * nearest                       (mask downsampling: model/propainter.py:409-417)

`jax.image.resize` implements none of these conventions bit-exactly, so we
build the source index/weight tables host-side (static shapes) and lower to
two small dense matmuls — which XLA maps straight onto the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _linear_weights(in_size: int, out_size: int, align_corners: bool):
    """Dense [out_size, in_size] interpolation matrix (numpy, host-side)."""
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = np.maximum((np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5, 0.0)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.clip(i0, 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = src - i0
    w0 = 1.0 - w1
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    np.add.at(mat, (np.arange(out_size), i0), w0)
    np.add.at(mat, (np.arange(out_size), i1), w1)
    return mat


@functools.lru_cache(maxsize=256)
def _linear_taps(in_size: int, out_size: int, align_corners: bool):
    """(i0, i1, w1) static tap tables for the 2-tap separable lerp."""
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = np.maximum(
            (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5, 0.0
        )
    i0 = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    return i0, i1, w1


@functools.lru_cache(maxsize=256)
def _nearest_indices(in_size: int, out_size: int):
    """Torch 'nearest' source indices: floor(i * in/out)."""
    idx = np.floor(np.arange(out_size, dtype=np.float64) * (in_size / out_size))
    return np.clip(idx.astype(np.int64), 0, in_size - 1)


@functools.lru_cache(maxsize=256)
def _phase_plan(in_size: int, out_size: int, align_corners: bool, nearest: bool):
    """Phase-strided decomposition of the 1-D resize gather.

    XLA's TPU gather runs at ~130 GB/s (6x below HBM peak) and a
    lane-axis (W) take is worse still — the decoder's two 2x upsamples
    alone cost ~88 ms of the feature stage at 640x360. But resize
    indices are STRUCTURED: writing j = P*k + p with P = out/gcd,
    S = in/gcd, the source index i0[j] equals k*S + delta for a small
    set of per-phase deltas (2-3 including edge clamps). Each (phase,
    delta) term is then a STATIC strided slice * a per-k weight vector
    — no gather at all, pure slices/multiplies/interleave, exact to the
    last bit vs the take-based form.

    Returns (P, S, g, pad_lo, pad_hi, terms) with terms =
    [(p, delta, weights[g])...]; weights fold both taps' contributions
    that land on the same source row.
    """
    import math

    if nearest:
        i0 = _nearest_indices(in_size, out_size)
        i1 = i0
        w1 = np.zeros(out_size, np.float64)
    else:
        i0, i1, w1 = _linear_taps(in_size, out_size, align_corners)
    w1 = w1.astype(np.float64)
    w0 = 1.0 - w1

    gcd = math.gcd(in_size, out_size)
    P = out_size // gcd
    S = in_size // gcd
    g = gcd  # outputs per phase

    terms: list = []
    min_d, max_d = 0, 0
    for p in range(P):
        js = np.arange(g) * P + p
        ks = np.arange(g)
        contrib: dict = {}
        for idx, wgt in ((i0[js], w0[js]), (i1[js], w1[js])):
            deltas = idx - ks * S
            for d in np.unique(deltas):
                sel = deltas == d
                vec = contrib.setdefault(int(d), np.zeros(g, np.float64))
                vec[sel] += wgt[sel]
        for d, vec in sorted(contrib.items()):
            if not np.any(vec):
                continue
            terms.append((p, d, vec.astype(np.float32)))
            min_d = min(min_d, d)
            max_d = max(max_d, d)
    pad_lo = max(0, -min_d)
    pad_hi = max(0, (g - 1) * S + max_d - (in_size - 1))
    return P, S, g, pad_lo, pad_hi, terms


def _phase_plan_cheap(plan, terms_per_phase: int) -> bool:
    """Whether a _phase_plan lowers to a small static-op program.

    Bounds BOTH axes of op-count growth: terms per phase (weighted adds)
    AND the number of distinct strided slices + the P-way interleave.
    Near-coprime sizes (e.g. 639->640: gcd=1, P=640) satisfy the
    terms-per-phase bound with ~2 terms each yet would emit O(in_size)
    slice ops and a 640-way interleave — a trace/compile blowup the
    take-based fallback avoids (ADVICE r4)."""
    P, S, g, _, _, terms = plan
    if len(terms) > terms_per_phase * P:
        return False
    n_slices = len({d for _, d, _ in terms})
    return P <= 32 and n_slices <= 16


def _axis_resize_phases(v, in_size: int, out_size: int, axis: int, plan):
    """Apply a _phase_plan along `axis`: strided slices + weighted sum
    per phase, interleave phases. All ops static; exact."""
    P, S, g, pad_lo, pad_hi, terms = plan
    dt = v.dtype
    if pad_lo or pad_hi:
        pads = [(0, 0)] * v.ndim
        pads[axis] = (pad_lo, pad_hi)
        v = jnp.pad(v, pads)

    def slc(delta):
        start = [0] * v.ndim
        stop = list(v.shape)
        strides = [1] * v.ndim
        start[axis] = delta + pad_lo
        stop[axis] = delta + pad_lo + (g - 1) * S + 1
        strides[axis] = S
        return jax.lax.slice(v, start, stop, strides)

    # cache slices by delta (phases share them)
    slices: dict = {}
    wshape = [1] * v.ndim
    wshape[axis] = g
    phase_outs = [None] * P
    for p, d, vec in terms:
        if d not in slices:
            slices[d] = slc(d)
        term = slices[d] * jnp.asarray(vec, dt).reshape(wshape)
        phase_outs[p] = term if phase_outs[p] is None else phase_outs[p] + term
    return _interleave_phases(phase_outs, axis)


def _interleave_phases(phase_outs, axis: int):
    """[P tensors of length g along axis] -> one [g*P] tensor with
    out[k*P + p] = phase_outs[p][k].

    Two lowerings: stack+reshape is fastest at moderate sizes (measured
    on the 640x360 decoder) but forces XLA into full-tensor layout
    copies at large shapes (two ~10GB copies for one 720p
    flow-completion upsample); past a size gate, interior-padded
    (stride-P) adds keep the peak at ~2x the output."""
    P = len(phase_outs)
    if P == 1:
        return phase_outs[0]
    big = phase_outs[0].size * P > 300_000_000
    if not big:
        stacked = jnp.stack(phase_outs, axis=axis + 1)
        out_shape = list(stacked.shape)
        out_shape[axis : axis + 2] = [stacked.shape[axis] * P]
        return stacked.reshape(out_shape)
    out = None
    for p, t in enumerate(phase_outs):
        cfg = [(0, 0, 0)] * t.ndim
        cfg[axis] = (p, P - 1 - p, P - 1)  # (lo, hi, interior)
        expanded = jax.lax.pad(t, jnp.zeros((), t.dtype), cfg)
        out = expanded if out is None else out + expanded
    return out


def resize_bilinear(
    x: jnp.ndarray, out_h: int, out_w: int, align_corners: bool = False
) -> jnp.ndarray:
    """Bilinear resize of [..., H, W, C] to [..., out_h, out_w, C].

    Exact torch `F.interpolate` semantics (both align_corners
    conventions). Lowered as phase-strided static slices + weighted
    interleave per axis (see _phase_plan) — no gathers; falls back to
    the 2-tap take form only when a phase plan would be degenerate
    (>4 terms per phase, i.e. pathological in/out ratios)."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    dt = x.dtype

    def axis_lerp(v, size_in, size_out, axis):
        plan = _phase_plan(size_in, size_out, align_corners, nearest=False)
        P, S, g, _, _, terms = plan
        if _phase_plan_cheap(plan, 4):  # small plan: slice form
            return _axis_resize_phases(v, size_in, size_out, axis, plan)
        i0, i1, w1 = _linear_taps(size_in, size_out, align_corners)
        v0 = jnp.take(v, jnp.asarray(i0), axis=axis)
        v1 = jnp.take(v, jnp.asarray(i1), axis=axis)
        shape = [1] * v.ndim
        shape[axis] = size_out
        wt = jnp.asarray(w1, dt).reshape(shape)
        return v0 + (v1 - v0) * wt

    x = axis_lerp(x, h, out_h, x.ndim - 3)
    return axis_lerp(x, w, out_w, x.ndim - 2)


def resize_nearest(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest-neighbour resize of [..., H, W, C] (torch 'nearest'
    convention), phase-strided like resize_bilinear."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x

    def axis_near(v, size_in, size_out, axis):
        plan = _phase_plan(size_in, size_out, False, nearest=True)
        P, S, g, _, _, terms = plan
        if _phase_plan_cheap(plan, 2):
            return _axis_resize_phases(v, size_in, size_out, axis, plan)
        return jnp.take(
            v, jnp.asarray(_nearest_indices(size_in, size_out)), axis=axis
        )

    x = axis_near(x, h, out_h, x.ndim - 3)
    return axis_near(x, w, out_w, x.ndim - 2)


def upflow8(flow: jnp.ndarray) -> jnp.ndarray:
    """8x convex-free flow upsampling (RAFT fallback path).

    flow: [N, H, W, 2] -> [N, 8H, 8W, 2], scaled by 8.
    Mirrors model/modules/RAFT/utils/utils.py:89-91 (bilinear,
    align_corners=True).
    """
    n, h, w, _ = flow.shape
    return 8.0 * resize_bilinear(flow, 8 * h, 8 * w, align_corners=True)


def _axis_phases_window(v, axis: int, plan, k0):
    """Phase-resize a CROPPED block along `axis` with the FULL image's
    sampling grid (2x upsample plans only: S == 1).

    v holds input rows [k0, k0 + n) of the full axis (k0 traced); returns
    output rows [P*k0, P*(k0 + n)) — bit-identical to slicing the
    full-image resize. The per-phase weight vectors are dynamic slices of
    the full-plan vectors at k0; boundary deltas read zero-padded block
    edges whose weights are zero at true image borders (the full plan's
    clamping is encoded in the weights), and whose pollution otherwise
    stays within the caller's halo."""
    P, S, g, _, _, terms = plan
    assert S == 1, "window resize supports integer upsampling plans only"
    n = v.shape[axis]
    deltas = [d for _, d, _ in terms]
    plo = max(0, -min(deltas))
    phi = max(0, max(deltas))
    pads = [(0, 0)] * v.ndim
    pads[axis] = (plo, phi)
    vp = jnp.pad(v, pads)

    def slc(delta):
        start = [0] * v.ndim
        start[axis] = delta + plo
        stop = list(vp.shape)
        stop[axis] = delta + plo + n
        return jax.lax.slice(vp, start, stop)

    wshape = [1] * v.ndim
    wshape[axis] = n
    slices: dict = {}
    phase_outs = [None] * P
    for p, d, vec in terms:
        if d not in slices:
            slices[d] = slc(d)
        wt = jax.lax.dynamic_slice(
            jnp.asarray(vec, v.dtype), (k0,), (n,)
        ).reshape(wshape)
        term = slices[d] * wt
        phase_outs[p] = term if phase_outs[p] is None else phase_outs[p] + term
    return _interleave_phases(phase_outs, axis)


def resize_2x_window(
    x: jnp.ndarray, y0k, x0k, full_h: int, full_w: int,
    align_corners: bool = True,
) -> jnp.ndarray:
    """2x bilinear upsample of block rows [y0k, y0k+n) x cols [x0k, ...)
    of a full [full_h, full_w] image, on the FULL image's grid (exact —
    see _axis_phases_window). x: [..., n_h, n_w, C]; y0k/x0k traced."""
    plan_h = _phase_plan(full_h, 2 * full_h, align_corners, nearest=False)
    plan_w = _phase_plan(full_w, 2 * full_w, align_corners, nearest=False)
    x = _axis_phases_window(x, x.ndim - 3, plan_h, y0k)
    return _axis_phases_window(x, x.ndim - 2, plan_w, x0k)
