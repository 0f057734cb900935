"""Pipeline stages: flow -> completion -> image prop -> feature prop.

Orchestrates the four stages of the reference driver
(propainter_inference.py:61-341) as jitted chunk programs:

  * chunk boundaries replicate the reference exactly (they define output
    semantics): RAFT width-bucketed clips with 1-frame overlap (:65-93),
    flow-completion subvideo chunks with 5-frame halo (:115-144),
    image-propagation chunks of <=100 with 10-frame halo (:172-212),
    sliding neighbor windows with global refs (:254-307);
  * each distinct chunk shape compiles once (JitCache) and runs on
    device end-to-end — composition and overlap blending included, so the
    video transfers to host exactly once (the reference round-trips every
    window: propainter_inference.py:286-293);
  * bf16 ("fp16 enable" on TPU) applies to flow completion + inpainting,
    RAFT stays fp32 (utils/model_utils.py:55-58).
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from ..models import flow_completion as fc
from ..models import propainter as pp
from ..models import raft
from ..utils.profiling import stage_timer


class JitCache:
    """jit-compile once per (salt, tag, static-arg tuple).

    The store is process-global so Pipeline instances are cheap: a new
    Pipeline for a new PipelineConfig re-uses every compiled program whose
    static key matches (config knobs that affect compilation — raft_iter,
    shapes, chunk lengths — are part of the keys). `salt` isolates
    mesh-dependent programs (shard_map closes over the mesh)."""

    _store: dict = {}

    def __init__(self, salt=None):
        self._salt = salt

    def get(self, tag: str, static, build: Callable):
        key = (self._salt, tag, static)
        if key not in self._store:
            self._store[key] = jax.jit(build())
        return self._store[key]


def get_ref_index(
    mid_neighbor_id: int,
    neighbor_ids: list[int],
    video_length: int,
    ref_stride: int,
    ref_num: int,
) -> list[int]:
    """Global reference frame selection (propainter_inference.py:36-58)."""
    ref_index = []
    if ref_num == -1:
        for i in range(0, video_length, ref_stride):
            if i not in neighbor_ids:
                ref_index.append(i)
    else:
        start_idx = max(0, mid_neighbor_id - ref_stride * (ref_num // 2))
        end_idx = min(video_length, mid_neighbor_id + ref_stride * (ref_num // 2))
        for i in range(start_idx, end_idx, ref_stride):
            if i not in neighbor_ids:
                if len(ref_index) > ref_num:
                    break
                ref_index.append(i)
    return ref_index


class Pipeline:
    """End-to-end video inpainting over converted params."""

    def __init__(
        self,
        raft_params: dict,
        flow_params: dict,
        inpaint_params: dict,
        config: PipelineConfig,
        mesh=None,
    ):
        self.config = config
        self.mesh = mesh  # optional jax Mesh: shards window batches (dp)
        rdtype = jnp.bfloat16 if config.raft_bf16 else jnp.float32
        self.raft_params = jax.tree.map(
            lambda a: jnp.asarray(a, dtype=rdtype), raft_params
        )
        cdtype = jnp.bfloat16 if config.use_bf16 else jnp.float32
        self.cdtype = cdtype
        self.flow_params = jax.tree.map(
            lambda a: jnp.asarray(a, dtype=cdtype), flow_params
        )
        self.inpaint_params = jax.tree.map(
            lambda a: jnp.asarray(a, dtype=cdtype), inpaint_params
        )
        salt = None
        if mesh is not None:
            salt = (
                tuple(mesh.shape.items()),
                tuple(str(d) for d in mesh.devices.flat),
            )
        self.jits = JitCache(salt)

    # --------------------------------------------------- clip parallelism

    def _clip_parallel(self) -> bool:
        """Batch the reference's sequential chunk loops (SURVEY §2.4a:
        propainter_inference.py:75-93,115-144,175-212) over a leading
        chunk axis sharded on the mesh "data" axis. On by default with a
        multi-device mesh; PROPAINTER_TPU_CLIP_PARALLEL=1 forces it
        single-device (fewer dispatches, more memory), =0 disables."""
        env = os.environ.get("PROPAINTER_TPU_CLIP_PARALLEL")
        if env is not None:
            return env == "1"
        if self.mesh is None:
            return False
        from ..parallel.mesh import DATA_AXIS

        return self.mesh.shape[DATA_AXIS] > 1

    def _dp(self) -> int:
        if self.mesh is None:
            return 1
        from ..parallel.mesh import DATA_AXIS

        return self.mesh.shape[DATA_AXIS]

    def _pad_chunks(self, arrays: tuple):
        """Pad the leading (chunk) axis to a multiple of dp by repeating
        the last chunk, and place on the mesh data axis."""
        dp = self._dp()
        c = arrays[0].shape[0]
        n_pad = (-c) % dp
        if n_pad:
            arrays = tuple(
                jnp.concatenate([a, jnp.repeat(a[-1:], n_pad, axis=0)])
                for a in arrays
            )
        if self.mesh is not None and dp > 1:
            from ..parallel.mesh import DATA_AXIS
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.mesh, P(DATA_AXIS))
            arrays = tuple(jax.device_put(a, sh) for a in arrays)
        return arrays

    def _chunk_mapped(self, fn, n_batched: int, n_rep: int = 1):
        """Wrap a chunk program for clip-parallel execution: with a
        multi-device mesh the chunk axis runs under shard_map (each device
        executes the WHOLE per-chunk program — Pallas kernels included —
        on its local chunks; no collectives are needed, chunks are
        independent); single-device it is just the batched program.
        The first `n_rep` args (params) replicate; the next `n_batched`
        args carry the chunk axis."""
        if self.mesh is None or self._dp() <= 1:
            return fn
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from ..parallel.mesh import DATA_AXIS

        spec = P(DATA_AXIS)
        in_specs = (P(),) * n_rep + (spec,) * n_batched
        return shard_map(
            fn, mesh=self.mesh, in_specs=in_specs, out_specs=spec,
            check_vma=False,
        )

    # ------------------------------------------------------------- stage 1

    def compute_flow(self, frames: jnp.ndarray):
        """Bidirectional RAFT flow, chunked (propainter_inference.py:61-99).

        frames: [1, T, H, W, 3] in [-1, 1] fp32.
        Returns (flows_f, flows_b): [1, T-1, H, W, 2] fp32.
        """
        cfg = self.config
        t = frames.shape[1]
        clip = cfg.raft_chunk_len()

        def build():
            return lambda prm, fr: raft.raft_bi_forward(prm, fr, iters=cfg.raft_iter)

        if t <= clip:
            fn = self.jits.get(
                "raft", (cfg.raft_iter, t) + frames.shape[2:4], build
            )
            with stage_timer("compute_flow") as tm:
                return tm.set(fn(self.raft_params, frames))

        # every chunk padded to clip+1 frames (repeat last) -> ONE compile;
        # flow pairs are independent, garbage pairs are sliced off
        chunk_len = clip + 1
        bounds = []
        for c in range(0, t, clip):
            end_f = min(t, c + clip)
            s = c if c == 0 else c - 1
            bounds.append((s, end_f))

        if self._clip_parallel() and len(bounds) > 1:
            # clip-parallel: chunks batch on a leading axis sharded over
            # the mesh "data" axis (the reference's sequential loop,
            # propainter_inference.py:75-93, is embarrassingly parallel)
            chunks = []
            for s, e in bounds:
                ck = frames[0, s:e]
                if e - s < chunk_len:
                    ck = jnp.concatenate(
                        [ck, jnp.repeat(ck[-1:], chunk_len - (e - s), axis=0)]
                    )
                chunks.append(ck)
            (batch,) = self._pad_chunks((jnp.stack(chunks),))
            fn = self.jits.get(
                "raft_cp",
                (cfg.raft_iter, chunk_len, batch.shape[0]) + frames.shape[2:4],
                lambda: self._chunk_mapped(build(), n_batched=1),
            )
            with stage_timer("compute_flow") as tm:
                ff, fb = tm.set(fn(self.raft_params, batch))
            flows_f = [
                ff[ci : ci + 1, : e - s - 1] for ci, (s, e) in enumerate(bounds)
            ]
            flows_b = [
                fb[ci : ci + 1, : e - s - 1] for ci, (s, e) in enumerate(bounds)
            ]
            return (
                jnp.concatenate(flows_f, axis=1),
                jnp.concatenate(flows_b, axis=1),
            )

        fn = self.jits.get(
            "raft", (cfg.raft_iter, chunk_len) + frames.shape[2:4], build
        )
        flows_f, flows_b = [], []
        for s, end_f in bounds:
            n_real = end_f - s
            chunk = frames[:, s:end_f]
            if n_real < chunk_len:
                reps = jnp.repeat(
                    chunk[:, -1:], chunk_len - n_real, axis=1
                )
                chunk = jnp.concatenate([chunk, reps], axis=1)
            with stage_timer("compute_flow") as tm:
                ff, fb = tm.set(fn(self.raft_params, chunk))
            flows_f.append(ff[:, : n_real - 1])
            flows_b.append(fb[:, : n_real - 1])
        return (
            jnp.concatenate(flows_f, axis=1),
            jnp.concatenate(flows_b, axis=1),
        )

    # ------------------------------------------------------------- stage 2

    @staticmethod
    def _complete_build():
        def f(prm, ff, fb, mk, t_valid):
            pf, pb = fc.forward_bidirect_flow(prm, ff, fb, mk, t_valid)
            return fc.combine_flow(ff, fb, pf, pb, mk)

        return f

    def complete_flow_chunk(self, ff, fb, mk, t_real, t_static):
        """One flow-completion chunk, zero-padded to the static length.
        Padding equivalence (scan resets + temporal-conv re-zeroing) makes
        real outputs exact -> ONE compile per config."""
        dt = self.cdtype
        build = self._complete_build

        n_pad = t_static - t_real
        if n_pad:
            padf = ((0, 0), (0, n_pad), (0, 0), (0, 0), (0, 0))
            ff = jnp.pad(ff, padf)
            fb = jnp.pad(fb, padf)
            mk = jnp.pad(mk, padf)
        fn = self.jits.get("flow_complete", ff.shape[1:], build)
        with stage_timer("complete_flow") as tm:
            of, ob = tm.set(fn(
                self.flow_params,
                ff.astype(dt),
                fb.astype(dt),
                mk.astype(dt),
                jnp.asarray(t_real),
            ))
        return of[:, :t_real], ob[:, :t_real]

    def complete_flow(self, flows, flow_masks):
        """Flow completion, subvideo chunks with 5-frame halo
        (propainter_inference.py:102-156).

        flows: (flows_f, flows_b) [1, T-1, H, W, 2]; flow_masks
        [1, T, H, W, 1]. Returns completed (flows_f, flows_b).
        """
        flows_f, flows_b = flows
        sub = self.config.subvideo_length
        flow_length = flows_f.shape[1]
        run = self.complete_flow_chunk

        if flow_length <= sub:
            return run(flows_f, flows_b, flow_masks, flow_length, flow_length)

        pad_len = 5
        chunk_static = sub + 2 * pad_len
        bounds = []
        for f in range(0, flow_length, sub):
            s_f = max(0, f - pad_len)
            e_f = min(flow_length, f + sub + pad_len)
            bounds.append((s_f, e_f, f - s_f, e_f - min(flow_length, f + sub)))

        if self._clip_parallel() and len(bounds) > 1:
            def pad_t(a, target):
                return jnp.pad(
                    a, ((0, 0), (0, target - a.shape[1])) + ((0, 0),) * 3
                )

            ffs = jnp.concatenate(
                [pad_t(flows_f[:, s:e], chunk_static) for s, e, _, _ in bounds]
            )
            fbs = jnp.concatenate(
                [pad_t(flows_b[:, s:e], chunk_static) for s, e, _, _ in bounds]
            )
            mks = jnp.concatenate(
                [
                    pad_t(flow_masks[:, s : e + 1], chunk_static + 1)
                    for s, e, _, _ in bounds
                ]
            )
            tvs = jnp.asarray([e - s for s, e, _, _ in bounds])
            ffs, fbs, mks, tvs = self._pad_chunks((ffs, fbs, mks, tvs))
            dt = self.cdtype
            fn = self.jits.get(
                "flow_complete_cp",
                (ffs.shape[0],) + ffs.shape[1:],
                lambda: self._chunk_mapped(
                    self._complete_build(), n_batched=4
                ),
            )
            with stage_timer("complete_flow") as tm:
                of, ob = tm.set(
                    fn(self.flow_params, ffs.astype(dt), fbs.astype(dt),
                       mks.astype(dt), tvs)
                )
            out_f, out_b = [], []
            for ci, (s_f, e_f, ps, pe) in enumerate(bounds):
                end = e_f - s_f - pe
                out_f.append(of[ci : ci + 1, ps:end])
                out_b.append(ob[ci : ci + 1, ps:end])
            return jnp.concatenate(out_f, axis=1), jnp.concatenate(out_b, axis=1)

        out_f, out_b = [], []
        for s_f, e_f, pad_len_s, pad_len_e in bounds:
            of, ob = run(
                flows_f[:, s_f:e_f],
                flows_b[:, s_f:e_f],
                flow_masks[:, s_f : e_f + 1],
                e_f - s_f,
                chunk_static,
            )
            end = e_f - s_f - pad_len_e
            out_f.append(of[:, pad_len_s:end])
            out_b.append(ob[:, pad_len_s:end])
        return jnp.concatenate(out_f, axis=1), jnp.concatenate(out_b, axis=1)

    # ------------------------------------------------------------- stage 3

    @staticmethod
    def _imgprop_build():
        def f(fr, mk, ff, fb, t_valid):
            masked = fr * (1 - mk)
            prop, upd_mask = pp.bidirectional_propagation_image(
                masked, ff, fb, mk, "nearest", t_valid=t_valid
            )
            updated = fr * (1 - mk) + prop * mk
            return updated, upd_mask

        return f

    def image_prop_chunk(self, fr, mk, ff, fb, t_real, t_static):
        """One image-propagation chunk, zero-padded to the static length."""
        dt = self.cdtype
        fr = fr.astype(dt)
        mk = mk.astype(dt)
        ff = ff.astype(dt)
        fb = fb.astype(dt)
        build = self._imgprop_build

        n_pad = t_static - t_real
        if n_pad:
            padf = ((0, 0), (0, n_pad), (0, 0), (0, 0), (0, 0))
            fr = jnp.pad(fr, padf)
            mk = jnp.pad(mk, padf)
            ff = jnp.pad(ff, padf)
            fb = jnp.pad(fb, padf)
        fn = self.jits.get("img_prop", fr.shape[1:], build)
        with stage_timer("image_propagation") as tm:
            uf, um = tm.set(fn(fr, mk, ff, fb, jnp.asarray(t_real)))
        return uf[:, :t_real], um[:, :t_real]

    def image_propagation(self, frames, masks_dilated, pred_flows):
        """Pixel-domain propagation, <=100-frame chunks with 10-frame halo
        (propainter_inference.py:159-225).

        frames [1, T, H, W, 3] (cdtype), masks_dilated [1, T, H, W, 1].
        Returns (updated_frames, updated_masks).
        """
        cfg = self.config
        t = frames.shape[1]
        sub = min(100, cfg.subvideo_length)
        dt = self.cdtype
        frames = frames.astype(dt)
        masks_dilated = masks_dilated.astype(dt)
        flows_f, flows_b = (f.astype(dt) for f in pred_flows)
        run = self.image_prop_chunk

        if t <= sub:
            return run(frames, masks_dilated, flows_f, flows_b, t, t)

        pad_len = 10
        chunk_static = sub + 2 * pad_len
        bounds = []
        for f in range(0, t, sub):
            s_f = max(0, f - pad_len)
            e_f = min(t, f + sub + pad_len)
            bounds.append((s_f, e_f, f - s_f, e_f - min(t, f + sub)))

        if self._clip_parallel() and len(bounds) > 1:
            def pad_t(a, target):
                return jnp.pad(
                    a, ((0, 0), (0, target - a.shape[1])) + ((0, 0),) * 3
                )

            frs = jnp.concatenate(
                [pad_t(frames[:, s:e], chunk_static) for s, e, _, _ in bounds]
            )
            mks = jnp.concatenate(
                [pad_t(masks_dilated[:, s:e], chunk_static) for s, e, _, _ in bounds]
            )
            ffs = jnp.concatenate(
                [pad_t(flows_f[:, s : e - 1], chunk_static - 1) for s, e, _, _ in bounds]
            )
            fbs = jnp.concatenate(
                [pad_t(flows_b[:, s : e - 1], chunk_static - 1) for s, e, _, _ in bounds]
            )
            tvs = jnp.asarray([e - s for s, e, _, _ in bounds])
            frs, mks, ffs, fbs, tvs = self._pad_chunks((frs, mks, ffs, fbs, tvs))
            fn = self.jits.get(
                "img_prop_cp",
                (frs.shape[0],) + frs.shape[1:],
                lambda: self._chunk_mapped(
                    self._imgprop_build(), n_batched=5, n_rep=0
                ),
            )
            with stage_timer("image_propagation") as tm:
                uf, um = tm.set(fn(frs, mks, ffs, fbs, tvs))
            out_frames, out_masks = [], []
            for ci, (s_f, e_f, ps, pe) in enumerate(bounds):
                end = e_f - s_f - pe
                out_frames.append(uf[ci : ci + 1, ps:end])
                out_masks.append(um[ci : ci + 1, ps:end])
            return (
                jnp.concatenate(out_frames, axis=1),
                jnp.concatenate(out_masks, axis=1),
            )

        out_frames, out_masks = [], []
        for s_f, e_f, pad_len_s, pad_len_e in bounds:
            uf, um = run(
                frames[:, s_f:e_f],
                masks_dilated[:, s_f:e_f],
                flows_f[:, s_f : e_f - 1],
                flows_b[:, s_f : e_f - 1],
                e_f - s_f,
                chunk_static,
            )
            end = e_f - s_f - pad_len_e
            out_frames.append(uf[:, pad_len_s:end])
            out_masks.append(um[:, pad_len_s:end])
        return (
            jnp.concatenate(out_frames, axis=1),
            jnp.concatenate(out_masks, axis=1),
        )

    # ------------------------------------------------------------- stage 4

    def window_predict_fn(self, l_t_max: int, ref_max: int, hw: tuple):
        """Jitted BATCHED window prediction: model forward + uint8
        composite against the original frames (no blending — that part is
        sequential and lives in blend_scan_fn). With a multi-device mesh
        the window batch runs under shard_map over the "data" axis (each
        device runs the whole forward — Pallas kernels included — on its
        local windows)."""

        def build():
            def f(prm, sel_frames, sel_masks, sel_upd, ff, fb, orig_slices,
                  l_t_valid, ref_valid):
                pred = pp.inpaint_generator_forward(
                    prm, sel_frames, ff, fb, sel_masks, sel_upd,
                    l_t_max, l_t_valid=l_t_valid, ref_valid=ref_valid,
                )
                pred = pred.astype(jnp.float32)  # [G, l_t_max, H, W, 3]
                pred_byte = jnp.floor((pred + 1.0) / 2.0 * 255.0)
                binary = sel_masks[:, :l_t_max].astype(jnp.float32)
                return jnp.floor(
                    pred_byte * binary + orig_slices * (1.0 - binary)
                )

            return self._chunk_mapped(f, n_batched=8, n_rep=1)

        return lambda prm, sf, sm, su, ff, fb, os_, lt, rf: self.jits.get(
            "window_predict",
            (sf.shape[0], l_t_max, ref_max) + tuple(hw),
            build,
        )(prm, sf, sm, su, ff, fb, os_, lt, rf)

    def blend_static_fn(self, chains_key: tuple, hw: tuple):
        """Jitted overlap blending with host-static chains.

        The reference's sequential revisit blend
        (propainter_inference.py:294-307) touches each frame through the
        ordered chain of windows containing it — at most
        ceil(l_t_max / neighbor_stride) ≈ 3 windows. The chain is known on
        the HOST (it is pure window-plan arithmetic), so every pick is a
        static slice — no device gathers at all (a dynamic-gather variant
        of this blend cost 0.46 s/24f on TPU; static slices are ~free).
        Bit-identical to the reference scan (same floors, same order).

        chains_key: per-frame tuple of (window, slot) visit pairs.
        """

        def build():
            def f(imgs):
                # imgs [nW, l_t_max, H, W, 3] float 0..255
                outs = []
                for chain in chains_key:
                    w0, s0 = chain[0]
                    comp = imgs[w0, s0]
                    for wi, si in chain[1:]:
                        comp = jnp.floor(0.5 * imgs[wi, si] + 0.5 * comp)
                    outs.append(comp)
                return jnp.stack(outs)

            return f

        return self.jits.get("blend_static", (chains_key,) + tuple(hw), build)

    def feature_window_fn(self, l_t_max: int, ref_max: int, hw: tuple):
        """Jitted one-window transformer + uint8 composite + overlap blend
        (compiled once per (l_t_max, ref_max, H, W))."""

        def build():
            def f(
                prm, sel_frames, sel_masks, sel_upd_masks, ff, fb,
                old_slice, orig_slice, blend, l_t_valid, ref_valid,
            ):
                pred = pp.inpaint_generator_forward(
                    prm, sel_frames, ff, fb, sel_masks, sel_upd_masks,
                    l_t_max, l_t_valid=l_t_valid, ref_valid=ref_valid,
                )
                pred = pred[0].astype(jnp.float32)  # [l_t_max, H, W, 3]
                # uint8 compositing (propainter_inference.py:283-307)
                pred_byte = jnp.floor((pred + 1.0) / 2.0 * 255.0)
                binary = sel_masks[0, :l_t_max].astype(jnp.float32)
                img = pred_byte * binary + orig_slice * (1.0 - binary)
                img = jnp.floor(img)  # uint8 cast of the composite
                blended = jnp.floor(
                    blend[:, None, None, None] * img
                    + (1.0 - blend[:, None, None, None]) * old_slice
                )
                return blended

            return f

        return self.jits.get("feature_prop", (l_t_max, ref_max) + tuple(hw), build)

    def feature_propagation(
        self,
        updated_frames,
        updated_masks,
        masks_dilated,
        pred_flows,
        original_frames,
    ):
        """Sliding-window transformer inference + on-device composition
        (propainter_inference.py:228-311).

        original_frames: [T, H, W, 3] float 0..255 integer-valued.
        Returns composed video [T, H, W, 3] float 0..255 (uint8-exact).
        """
        cfg = self.config
        t = updated_frames.shape[1]
        dt = self.cdtype
        flows_f, flows_b = (f.astype(dt) for f in pred_flows)
        updated_frames = updated_frames.astype(dt)
        updated_masks = updated_masks.astype(dt)
        masks_dilated = masks_dilated.astype(dt)

        neighbor_stride = cfg.neighbor_stride
        ref_num = cfg.subvideo_length // cfg.ref_stride if t > cfg.subvideo_length else -1

        # window plan (host-side, mirrors propainter_inference.py:254-261)
        windows = []
        for f in range(0, t, neighbor_stride):
            neighbor_ids = list(
                range(max(0, f - neighbor_stride), min(t, f + neighbor_stride + 1))
            )
            ref_ids = get_ref_index(f, neighbor_ids, t, cfg.ref_stride, ref_num)
            windows.append((neighbor_ids, ref_ids))

        # static padded geometry: ONE compile per (l_t_max, ref_bucket)
        l_t_max = 2 * neighbor_stride + 1
        ref_max = max((len(r) for _, r in windows), default=0)
        ref_max = max(2, -(-ref_max // 2) * 2)  # bucket to even

        pad_t = ((0, 0), (0, l_t_max), (0, 0), (0, 0), (0, 0))
        uf_p = jnp.pad(updated_frames, pad_t)
        um_p = jnp.pad(updated_masks, pad_t)
        md_p = jnp.pad(masks_dilated, pad_t)
        ff_p = jnp.pad(flows_f, pad_t)
        fb_p = jnp.pad(flows_b, pad_t)

        orig_p = jnp.pad(
            original_frames.astype(jnp.float32),
            ((0, l_t_max), (0, 0), (0, 0), (0, 0)),
        )  # [T + l_t_max, H, W, 3]

        # ---- Window predictions are independent of each other (only the
        # uint8 blend chain is sequential, propainter_inference.py:294-307),
        # so run the model BATCHED over fixed-size groups (big MXU batches,
        # few dispatches). Windows with different (l_t, n_ref) share one
        # compiled shape: valid counts are per-window [G] vectors (scan
        # restarts + attention key masks make padded slots inert), and the
        # last group pads with repeats of its final window.
        group_size = int(os.environ.get("PROPAINTER_TPU_WINDOW_BATCH", "4"))
        # with a data-parallel mesh every group must split evenly over the
        # devices, so the shard_map'd predict always engages
        group_size = -(-group_size // self._dp()) * self._dp()
        predict = self.window_predict_fn(l_t_max, ref_max, updated_frames.shape[2:4])

        n_windows = len(windows)
        imgs_per_window: list = [None] * n_windows
        for g0 in range(0, n_windows, group_size):
            grp = list(range(g0, min(n_windows, g0 + group_size)))
            padded = grp + [grp[-1]] * (group_size - len(grp))
            sels, valids, n0s, lts, refs = [], [], [], [], []
            for wi in padded:
                nids, rids = windows[wi]
                l_t, n_ref = len(nids), len(rids)
                sels.append(
                    nids + [0] * (l_t_max - l_t) + rids + [0] * (ref_max - n_ref)
                )
                valids.append(
                    [1.0] * l_t + [0.0] * (l_t_max - l_t)
                    + [1.0] * n_ref + [0.0] * (ref_max - n_ref)
                )
                n0s.append(nids[0])
                lts.append(l_t)
                refs.append(n_ref)
            sel_idx = jnp.asarray(sels)  # [G, T_sel]
            valid = jnp.asarray(valids, updated_masks.dtype)[:, :, None, None, None]
            n0_arr = jnp.asarray(n0s)

            sel_frames = uf_p[0, sel_idx]  # [G, T_sel, H, W, 3]
            sel_masks = md_p[0, sel_idx] * valid
            sel_upd = um_p[0, sel_idx] * valid
            ff = jax.vmap(
                lambda s: jax.lax.dynamic_slice_in_dim(ff_p[0], s, l_t_max - 1, 0)
            )(n0_arr)
            fb = jax.vmap(
                lambda s: jax.lax.dynamic_slice_in_dim(fb_p[0], s, l_t_max - 1, 0)
            )(n0_arr)
            orig_slices = jax.vmap(
                lambda s: jax.lax.dynamic_slice_in_dim(orig_p, s, l_t_max, 0)
            )(n0_arr)
            if self.mesh is not None:
                from ..parallel.inference import shard_window_batch

                sel_frames, sel_masks, sel_upd, ff, fb, orig_slices = (
                    shard_window_batch(
                        self.mesh,
                        (sel_frames, sel_masks, sel_upd, ff, fb, orig_slices),
                    )
                )
            with stage_timer("feature_propagation") as tm:
                imgs = tm.set(predict(
                    self.inpaint_params, sel_frames, sel_masks, sel_upd,
                    ff, fb, orig_slices, jnp.asarray(lts), jnp.asarray(refs),
                ))
            for gi, wi in enumerate(grp):
                imgs_per_window[wi] = imgs[gi]

        # per-frame blend chains from the deterministic visit order: frame
        # i is touched by windows {w : i in nids_w} in window order, first
        # visit replacing, revisits 0.5/0.5 (propainter_inference.py:294-307)
        chains: list[list[tuple[int, int]]] = [[] for _ in range(t)]
        for wi, (nids, _) in enumerate(windows):
            for slot, i in enumerate(nids):
                chains[i].append((wi, slot))
        chains_key = tuple(tuple(c) for c in chains)

        blend_fn = self.blend_static_fn(chains_key, updated_frames.shape[2:4])
        with stage_timer("blend") as tm:
            composed = tm.set(blend_fn(jnp.stack(imgs_per_window)))
        return composed[:t]

    # ------------------------------------------------------------ full run

    def process(self, frames_norm, flow_masks, masks_dilated, original_frames):
        """Full process_inpainting + feature_propagation
        (propainter_inference.py:314-341, 228-311).

        frames_norm: [1, T, H, W, 3] fp32 in [-1, 1]
        flow_masks / masks_dilated: [1, T, H, W, 1]
        original_frames: [T, H, W, 3] float 0..255
        Returns composed [T, H, W, 3] float 0..255.
        """
        gt_flows = self.compute_flow(frames_norm)
        pred_flows = self.complete_flow(gt_flows, flow_masks)
        updated_frames, updated_masks = self.image_propagation(
            frames_norm, masks_dilated, pred_flows
        )
        return self.feature_propagation(
            updated_frames, updated_masks, masks_dilated, pred_flows, original_frames
        )
