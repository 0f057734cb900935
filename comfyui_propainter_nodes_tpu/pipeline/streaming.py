"""Exact streaming execution for long videos with a bounded working set.

The reference holds the whole video (and all intermediate stacks) in
device memory and only chunks compute (propainter_inference.py:61-225);
at 1080p x 1000 frames that is tens of GB. This driver streams the video
through the same four stages with a sliding working set of
O(subvideo_length) frames while producing BIT-IDENTICAL output:

  * RAFT flows are per-pair independent -> computed for exactly the
    ranges needed (the reference's clip chunking has no numeric effect);
  * flow-completion / image-propagation chunk boundaries are ABSOLUTE
    (multiples of subvideo_length with fixed halos,
    propainter_inference.py:115-144,172-212) — the streaming driver
    reproduces those exact chunks via Pipeline.complete_flow_chunk /
    image_prop_chunk and caches per-chunk outputs;
  * transformer windows slide at neighbor_stride with global refs
    bounded to +-ref_stride*(ref_num//2) frames (:36-58, :254-261), so a
    lookahead of one chunk suffices; the 0.5/0.5 revisit blend and
    composed-frame state roll forward in a small tail buffer.

Frames enter via any `fetch(start, count) -> [count, H, W, C] float01`
source (e.g. utils.frameio.VideoSource, backed by the native mmap +
prefetch loader) and leave through a writer callback per finalized
frame range.
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import image as image_utils
from .stages import Pipeline, get_ref_index


class _ChunkCache:
    """chunk_index -> value cache with explicit eviction below a floor."""

    def __init__(self, compute: Callable[[int], object]):
        self._compute = compute
        self._store: dict[int, object] = {}

    def get(self, k: int):
        if k not in self._store:
            self._store[k] = self._compute(k)
        return self._store[k]

    def evict_below(self, k_min: int):
        for k in [k for k in self._store if k < k_min]:
            del self._store[k]


def process_streaming(
    pipe: Pipeline,
    fetch: Callable[[int, int], np.ndarray],
    fetch_mask: Callable[[int, int], np.ndarray],
    num_frames: int,
    write: Callable[[int, np.ndarray], None],
    mask_dilates: int = 5,
    flow_mask_dilates: int = 8,
    prefetch: Callable[[int, int], None] | None = None,
) -> None:
    """Run the full pipeline over `num_frames`, writing finalized composed
    frames (float 0..255, uint8-exact) through `write(start, frames)`.

    fetch(start, count): frames [count, H, W, 3] float in [0, 1] at the
    source resolution (out-of-range reads may return anything; they are
    never requested). fetch_mask likewise [count, H, W].
    """
    cfg = pipe.config
    t = num_frames
    pw, ph = cfg.process_size
    sub = cfg.subvideo_length
    sub_img = min(100, sub)
    ns = cfg.neighbor_stride
    ref_num = sub // cfg.ref_stride if t > sub else -1

    # ---------------- per-frame prepared tensors (cached by chunk) ------
    # the cache stores byte frames + BINARY masks as uint8 (the PIL-exact
    # resize's _round8 makes byte frames integral 0..255, so uint8 is
    # exact); the [-1,1] normalization is recomputed per gather with the
    # identical expression (byte/255*2-1 in f32), so nothing numeric
    # changes while the resident footprint drops ~8x vs the original f32
    # norm+byte form (~0.94GB per 32-frame 720p chunk, several chunks
    # live — part of the 240f 720p streaming OOM). Chunks shrink at
    # large areas.
    prep_chunk = 32 if ph * pw <= 640 * 480 else 16

    def _prep(k: int):
        lo = k * prep_chunk
        n = min(prep_chunk, t - lo)
        if prefetch is not None:
            prefetch(lo + n, prep_chunk)
        frames = jnp.asarray(fetch(lo, n))
        masks = jnp.asarray(fetch_mask(lo, n))
        _, byte = image_utils.prepare_frames(frames, pw, ph)
        flow_m, dil_m = image_utils.prepare_masks(
            masks, pw, ph, flow_mask_dilates, mask_dilates
        )
        # byte frames are integral 0..255 (PIL-exact resize ends in
        # _round8), so uint8 storage is EXACT and quarters the resident
        # prep cache (176 -> 44MB per 16-frame 720p chunk; the prep floor
        # stays at 0 for most of the video, so every chunk below the
        # completion lookback stays live — part of the 240f 720p OOM)
        out = (
            byte.astype(jnp.uint8),
            flow_m.astype(jnp.uint8),
            dil_m.astype(jnp.uint8),
        )
        # high-res: retire each prep program (and free its ~400MB f32
        # upload) before anything else dispatches — see _hires_sync
        _hires_sync(out[0])
        _hires_sync(out[2])
        return out

    def _hires_sync(x):
        """4-byte fetch forcing a cache computation to finish before the
        next one is dispatched (high-res only): with everything async,
        the first window's whole prep->flows->completion->image-prop
        chain queues up with every intermediate buffer live at once."""
        if ph * pw > 640 * 480:
            np.asarray(jnp.max(jax.tree_util.tree_leaves(x)[0]))
        return x

    prep = _ChunkCache(_prep)

    @jax.jit
    def _norm_chunk(u8):
        # == prepare_frames' normalization (byte/255*2-1 in f32); the
        # f32 transient lives only inside this jit — eager slicing built
        # the whole range in f32 (2GB for one 86-frame 1080p gather)
        return (u8.astype(jnp.float32) / 255.0) * 2.0 - 1.0

    def gather(i: int, lo: int, hi: int, dt=jnp.float32):
        """Prepared tensors for absolute frame range [lo, hi) (clamped).
        i: 0 = normalized frames, 1 = byte frames, 2/3 = masks.
        dt: output dtype — consumers that cast anyway (RAFT to its param
        dtype, completion/image-prop to cdtype) pass it here so the f32
        form never materializes for the whole range."""
        lo = max(0, lo)
        hi = min(t, hi)
        parts = []
        k0, k1 = lo // prep_chunk, (hi - 1) // prep_chunk
        for k in range(k0, k1 + 1):
            cached = prep.get(k)
            s = max(lo - k * prep_chunk, 0)
            e = min(hi - k * prep_chunk, cached[0].shape[0])
            if i == 0:
                a = _norm_chunk(cached[0][s:e]).astype(dt)
            else:
                a = cached[0 if i == 1 else i - 1][s:e].astype(dt)
            parts.append(a)
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    # ---------------- stage 1+2: completed flows per absolute chunk -----
    pad_fc = 5
    flow_len = t - 1
    single_fc = flow_len <= sub

    def _flows_range(lo: int, hi: int):
        """Raw RAFT flows for pair indices [lo, hi) (pairs independent).

        Returned in the pipeline compute dtype: flow completion casts its
        inputs to cdtype anyway, so casting HERE is numerically identical
        while halving the streamed flow buffers (f32 flows for one 80-pair
        720p chunk are 1.25GB — part of the high-res HBM budget)."""
        rdt = jax.tree_util.tree_leaves(pipe.raft_params)[0].dtype
        if ph * pw <= 640 * 480:
            frames = gather(0, lo, hi + 1, rdt)[None]
            ff, fb = pipe.compute_flow(frames)
            return ff.astype(pipe.cdtype), fb.astype(pipe.cdtype)
        # high-res: pairs are independent, so chop the range into bounded
        # sub-dispatches, each synced before the next dispatches. One
        # 85-pair 1080p program is ~2.5 min of device time in a SINGLE
        # execution — past the axon worker's tolerance (observed as a
        # worker crash; a 44-pair program runs clean) — and bounding the
        # in-flight set also caps buffer co-residency with the completion
        # program.
        step_p = int(os.environ.get("PROPAINTER_TPU_STREAM_FLOW_PAIRS", "24"))
        outs_f, outs_b = [], []
        for a in range(lo, hi, step_p):
            b_ = min(hi, a + step_p)
            frames = gather(0, a, b_ + 1, rdt)[None]
            ff, fb = pipe.compute_flow(frames)
            _hires_sync(ff)
            outs_f.append(ff.astype(pipe.cdtype))
            outs_b.append(fb.astype(pipe.cdtype))
        if len(outs_f) == 1:
            return outs_f[0], outs_b[0]
        return (
            jnp.concatenate(outs_f, axis=1),
            jnp.concatenate(outs_b, axis=1),
        )

    def _completed(k: int):
        if single_fc:
            s_f, e_f = 0, flow_len
            t_static = flow_len
        else:
            f = k * sub
            s_f = max(0, f - pad_fc)
            e_f = min(flow_len, f + sub + pad_fc)
            t_static = sub + 2 * pad_fc
        ff, fb = _flows_range(s_f, e_f)
        mk = gather(2, s_f, e_f + 1, pipe.cdtype)[None]
        of, ob = pipe.complete_flow_chunk(ff, fb, mk, e_f - s_f, t_static)
        _hires_sync(of)
        if single_fc:
            return 0, of, ob
        keep_lo = k * sub - s_f
        keep_hi = min(flow_len, (k + 1) * sub) - s_f
        return k * sub, of[:, keep_lo:keep_hi], ob[:, keep_lo:keep_hi]

    completed = _ChunkCache(_completed)

    def completed_range(lo: int, hi: int):
        """Completed flows for pair indices [lo, hi)."""
        parts_f, parts_b = [], []
        step = flow_len if single_fc else sub
        for k in range(lo // step, (hi - 1) // step + 1):
            base, of, ob = completed.get(k)
            s = max(lo - base, 0)
            e = min(hi - base, of.shape[1])
            parts_f.append(of[:, s:e])
            parts_b.append(ob[:, s:e])
        if len(parts_f) == 1:
            return parts_f[0], parts_b[0]
        return jnp.concatenate(parts_f, 1), jnp.concatenate(parts_b, 1)

    # ---------------- stage 3: updated frames per absolute chunk --------
    pad_ip = 10
    single_ip = t <= sub_img

    def _updated(k: int):
        if single_ip:
            s_f, e_f, t_static = 0, t, t
        else:
            f = k * sub_img
            s_f = max(0, f - pad_ip)
            e_f = min(t, f + sub_img + pad_ip)
            t_static = sub_img + 2 * pad_ip
        fr = gather(0, s_f, e_f, pipe.cdtype)[None]
        mk = gather(3, s_f, e_f, pipe.cdtype)[None]
        ff, fb = completed_range(s_f, e_f - 1)
        uf, um = pipe.image_prop_chunk(fr, mk, ff, fb, e_f - s_f, t_static)
        _hires_sync(uf)
        if single_ip:
            return 0, uf, um
        keep_lo = k * sub_img - s_f
        keep_hi = min(t, (k + 1) * sub_img) - s_f
        return k * sub_img, uf[:, keep_lo:keep_hi], um[:, keep_lo:keep_hi]

    updated = _ChunkCache(_updated)

    def updated_at(idx_list):
        """Updated frames/masks at arbitrary absolute indices."""
        ufs, ums = [], []
        step = t if single_ip else sub_img
        for i in idx_list:
            base, uf, um = updated.get(i // step)
            ufs.append(uf[:, i - base])
            ums.append(um[:, i - base])
        return jnp.stack(ufs, axis=1), jnp.stack(ums, axis=1)

    # ---------------- stage 4: sliding windows + rolling composition ----
    l_t_max = 2 * ns + 1
    windows = []
    for f in range(0, t, ns):
        neighbor_ids = list(range(max(0, f - ns), min(t, f + ns + 1)))
        ref_ids = get_ref_index(f, neighbor_ids, t, cfg.ref_stride, ref_num)
        windows.append((neighbor_ids, ref_ids))
    ref_max = max((len(r) for _, r in windows), default=0)
    ref_max = max(2, -(-ref_max // 2) * 2)
    fn = pipe.feature_window_fn(l_t_max, ref_max, (ph, pw))

    visited = np.zeros(t, dtype=bool)
    # rolling composed tail: absolute frames [tail_base, tail_base+len)
    tail_base = 0
    tail = jnp.zeros((0, ph, pw, 3), jnp.float32)
    ref_span = cfg.ref_stride * (ref_num // 2) if ref_num > 0 else t

    dt = pipe.cdtype
    n_windows = len(windows)
    for win_i, (neighbor_ids, ref_ids) in enumerate(windows):
        l_t = len(neighbor_ids)
        n_ref = len(ref_ids)
        n0 = neighbor_ids[0]

        # extend the composed tail to cover this window
        need_hi = n0 + l_t_max
        if tail.shape[0] < need_hi - tail_base:
            lo = tail_base + tail.shape[0]
            if lo >= t:  # the window's tail reach is entirely padding
                newly = jnp.zeros((0, ph, pw, 3), jnp.float32)
            else:
                newly = gather(1, lo, min(t, need_hi))
            if newly.shape[0] < need_hi - lo:  # pad region beyond the video
                padn = need_hi - lo - newly.shape[0]
                newly = jnp.concatenate(
                    [newly, jnp.zeros((padn, ph, pw, 3), newly.dtype)], 0
                )
            tail = jnp.concatenate([tail, newly.astype(jnp.float32)], axis=0)

        # padded slots are fully masked in the window program (l_t_valid/
        # ref_valid + zeroed masks), so their CONTENT is irrelevant — but
        # their INDEX must stay inside the live working set: padding with
        # frame 0 resurrected evicted chunk 0, recomputing its whole
        # flows->completion->image-prop chain for every window with a
        # padded ref slot (most of them) once eviction began
        sel = (
            neighbor_ids + [n0] * (l_t_max - l_t)
            + ref_ids + [n0] * (ref_max - n_ref)
        )
        uf_sel, um_sel = updated_at(sel)
        md_sel = jnp.stack([gather(3, i, i + 1, dt)[0] for i in sel], 0)[None]
        valid = jnp.asarray(
            [1.0] * l_t + [0.0] * (l_t_max - l_t)
            + [1.0] * n_ref + [0.0] * (ref_max - n_ref),
            um_sel.dtype,
        )[None, :, None, None, None]
        sel_masks = md_sel.astype(dt) * valid
        sel_upd = um_sel * valid

        ff, fb = completed_range(n0, min(n0 + l_t - 1, flow_len))
        if ff.shape[1] < l_t_max - 1:
            padn = l_t_max - 1 - ff.shape[1]
            padf = ((0, 0), (0, padn), (0, 0), (0, 0), (0, 0))
            ff = jnp.pad(ff, padf)
            fb = jnp.pad(fb, padf)

        old_slice = jax.lax.dynamic_slice_in_dim(
            tail, n0 - tail_base, l_t_max, axis=0
        )
        orig = gather(1, n0, min(t, n0 + l_t_max)).astype(jnp.float32)
        if orig.shape[0] < l_t_max:
            orig = jnp.concatenate(
                [orig, jnp.zeros((l_t_max - orig.shape[0], ph, pw, 3))], 0
            )
        blend = jnp.asarray(
            [0.5 if visited[i] else 1.0 for i in neighbor_ids]
            + [0.0] * (l_t_max - l_t),
            jnp.float32,
        )
        blended = fn(
            pipe.inpaint_params,
            uf_sel.astype(dt),
            sel_masks,
            sel_upd.astype(dt),
            ff.astype(dt),
            fb.astype(dt),
            old_slice,
            orig,
            blend,
            jnp.asarray(l_t),
            jnp.asarray(n_ref),
        )
        tail = jax.lax.dynamic_update_slice_in_dim(
            tail, blended, n0 - tail_base, axis=0
        )
        for i in neighbor_ids:
            visited[i] = True

        if ph * pw > 640 * 480:
            # high-res: force each window to finish before dispatching
            # the next (4-byte fetch). Async dispatch otherwise queues
            # several windows whose gathered inputs/outputs (~1GB each at
            # 720p) are all live at once and OOM the chip; at these
            # sizes a window's compute dwarfs the sync round-trip.
            np.asarray(jnp.max(blended[0, 0, :4]))

        pipe._report("feature_windows", win_i + 1, n_windows)

        # frames before the next window's reach are final -> flush
        final_hi = min(n0, t)
        if final_hi > tail_base:
            n_out = final_hi - tail_base
            write(tail_base, np.asarray(tail[:n_out]))
            tail = tail[n_out:]
            tail_base = final_hi

        # evict caches outside the remaining working set. Future windows
        # (f' >= this window's f) touch frames >= f - ref_span; each
        # cache's floor then chains through the recompute halos: a
        # future _updated(k) re-reads completed pairs / prep frames from
        # k*sub_img - pad_ip, a future _completed(k) reads prep frames
        # from k*sub - pad_fc. (The previous single `lookback` formula
        # subtracted sub_img on top of ref_span for every cache — at
        # 720p that conservatism kept an extra ~1.5GB of dead chunks
        # alive through the no-eviction prefix of the video.)
        f_lo = max(0, n0 + ns - ref_span - ns)  # earliest future-needed frame
        upd_floor = 0 if single_ip else f_lo // sub_img
        updated.evict_below(upd_floor)
        cmp_need = min(f_lo, max(0, upd_floor * sub_img - pad_ip))
        cmp_floor = 0 if single_fc else cmp_need // sub
        completed.evict_below(cmp_floor)
        prep_need = min(
            tail_base,
            cmp_need,
            max(0, (cmp_floor * sub - pad_fc) if not single_fc else 0),
        )
        prep.evict_below(max(0, prep_need) // prep_chunk)

    if tail_base < t:
        write(tail_base, np.asarray(tail[: t - tail_base]))
