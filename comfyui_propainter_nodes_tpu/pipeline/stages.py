"""Pipeline stages: flow -> completion -> image prop -> feature prop.

Orchestrates the four stages of the reference driver
(propainter_inference.py:61-341) as jitted programs:

  * chunk boundaries replicate the reference exactly where they define
    output semantics: flow-completion subvideo chunks with 5-frame halo
    (:115-144), image-propagation chunks of <=100 with 10-frame halo
    (:172-212), sliding neighbor windows with global refs (:254-307).
    RAFT's width-bucketed clip chunking (:65-93) is pure memory
    management (every flow pair is independent), so the TPU build frees
    itself to batch all pairs at once when HBM allows;
  * ALL per-stage glue — dtype casts, pads, chunk slicing, window
    gathers, uint8 composition, overlap blending — is traced INSIDE the
    stage programs. A stage is ONE device dispatch. (Round-2 ran this
    glue as eager ops between dispatches; on a remote-tunneled TPU each
    eager op costs tens of ms of host round-trip, which added up to
    ~2.5s of the 5.6s/24f wall time — more than any single stage's
    device compute.);
  * when the whole clip fits a single subvideo chunk (the common node
    invocation), `process` fuses all four stages into ONE compiled
    XLA program: one dispatch, one host->device upload, one fetch, and
    XLA is free to overlap/fuse across stage boundaries;
  * the overlap blend (propainter_inference.py:294-307) is a
    T-independent `lax.scan` over windows on a frame canvas — one
    compile for any video length (round-2 unrolled one slice-chain per
    frame, which re-compiled per T and traced O(T) programs);
  * bf16 ("fp16 enable" on TPU) applies to flow completion + inpainting.
    RAFT defaults to bf16 params/convs with fp32 flow state, corr
    volume and upsampling (config.raft_bf16; the reference pins fp16
    RAFT off because CUDA fp16 overflows — bf16 has fp32 exponent
    range, see config.py).
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
from ..utils.profiling import callbacks_supported, progress_report, stage_timer


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


# ---------------------------------------------------------------- host plans
#
# Everything the reference decides with Python control flow over T —
# chunk bounds, window neighbor/ref ids, blend visit order — is pure
# arithmetic on (T, config). These plans are computed ON THE HOST once
# per (T, config) and baked into the traced programs as static data.


def flow_chunk_plan(cfg: PipelineConfig, t: int) -> list[tuple[int, int]]:
    """RAFT clip bounds with 1-frame overlap (propainter_inference.py:75-93)."""
    clip = cfg.raft_chunk_len()
    bounds = []
    for c in range(0, t, clip):
        end_f = min(t, c + clip)
        s = c if c == 0 else c - 1
        bounds.append((s, end_f))
    return bounds


def complete_chunk_plan(cfg: PipelineConfig, flow_length: int):
    """(start, end, lead_halo, tail_halo) per subvideo chunk
    (propainter_inference.py:115-144)."""
    sub = cfg.subvideo_length
    pad_len = 5
    bounds = []
    for f in range(0, flow_length, sub):
        s_f = max(0, f - pad_len)
        e_f = min(flow_length, f + sub + pad_len)
        bounds.append((s_f, e_f, f - s_f, e_f - min(flow_length, f + sub)))
    return bounds, sub + 2 * pad_len


def imgprop_chunk_plan(cfg: PipelineConfig, t: int):
    """<=100-frame chunks with 10-frame halo (propainter_inference.py:172-212)."""
    sub = min(100, cfg.subvideo_length)
    pad_len = 10
    bounds = []
    for f in range(0, t, sub):
        s_f = max(0, f - pad_len)
        e_f = min(t, f + sub + pad_len)
        bounds.append((s_f, e_f, f - s_f, e_f - min(t, f + sub)))
    return bounds, sub + 2 * pad_len


def window_plan(cfg: PipelineConfig, t: int):
    """Sliding windows + global refs (propainter_inference.py:254-261)."""
    neighbor_stride = cfg.neighbor_stride
    ref_num = (
        cfg.subvideo_length // cfg.ref_stride if t > cfg.subvideo_length else -1
    )
    windows = []
    for f in range(0, t, neighbor_stride):
        neighbor_ids = list(
            range(max(0, f - neighbor_stride), min(t, f + neighbor_stride + 1))
        )
        ref_ids = get_ref_index(f, neighbor_ids, t, cfg.ref_stride, ref_num)
        windows.append((neighbor_ids, ref_ids))
    return windows


def _window_tables(cfg: PipelineConfig, t: int):
    """Static per-window index/validity tables for the feature stage.

    Returns (sels, valids, starts, lts, refs, slot_valid, l_t_max,
    ref_max): per-window frame selections (local + global refs padded to
    static buckets), their validity, window start frames, per-window
    local/ref counts, and the blend slot-validity map."""
    windows = window_plan(cfg, t)
    n_windows = len(windows)
    neighbor_stride = cfg.neighbor_stride
    l_t_max = 2 * neighbor_stride + 1
    ref_max = max((len(r) for _, r in windows), default=0)
    ref_max = max(2, -(-ref_max // 2) * 2)  # bucket to even
    t_sel = l_t_max + ref_max

    sels = np.zeros((n_windows, t_sel), np.int32)
    valids = np.zeros((n_windows, t_sel), np.float32)
    starts = np.zeros((n_windows,), np.int32)
    lts = np.zeros((n_windows,), np.int32)
    refs = np.zeros((n_windows,), np.int32)
    slot_valid = np.zeros((n_windows, l_t_max), np.bool_)
    for wi, (nids, rids) in enumerate(windows):
        l_t, n_ref = len(nids), len(rids)
        sels[wi] = np.asarray(
            nids + [0] * (l_t_max - l_t) + rids + [0] * (ref_max - n_ref)
        )
        valids[wi, :l_t] = 1.0
        valids[wi, l_t_max : l_t_max + n_ref] = 1.0
        starts[wi] = nids[0]
        lts[wi] = l_t
        refs[wi] = n_ref
        slot_valid[wi, :l_t] = True
    return sels, valids, starts, lts, refs, slot_valid, l_t_max, ref_max


def _blend_windows(imgs, starts, slot_valid, t: int, l_t_max: int):
    """Overlap blend: first-visit-replace / revisit-0.5-blend, exactly
    the reference's visit order (propainter_inference.py:294-307).
    imgs [nW, l_t_max, H, W, 3] f32 0..255 -> [T, H, W, 3].
    A T-independent `lax.scan` over windows on a frame canvas."""
    h, w = imgs.shape[2], imgs.shape[3]
    canvas0 = jnp.zeros((t + l_t_max, h, w, 3), jnp.float32)
    seen0 = jnp.zeros((t + l_t_max,), jnp.bool_)

    def step(carry, inp):
        canvas, seen = carry
        img_w, s0, sv = inp
        cur = jax.lax.dynamic_slice_in_dim(canvas, s0, l_t_max, 0)
        sn = jax.lax.dynamic_slice_in_dim(seen, s0, l_t_max, 0)
        blended = jnp.where(
            sn[:, None, None, None],
            jnp.floor(0.5 * img_w + 0.5 * cur),
            img_w,
        )
        svb = sv[:, None, None, None]
        upd = jnp.where(svb, blended, cur)
        canvas = jax.lax.dynamic_update_slice_in_dim(canvas, upd, s0, 0)
        seen = jax.lax.dynamic_update_slice_in_dim(seen, sn | sv, s0, 0)
        return (canvas, seen), None

    (canvas, _), _ = jax.lax.scan(
        step, (canvas0, seen0), (imgs, starts, slot_valid)
    )
    return canvas[:t]


def _window_group_size(n_windows: int, dp: int) -> int:
    """Windows per batched forward. Default: all windows in one group
    (one dispatch, zero padding waste) capped at 8 for activation memory
    (the transformer holds ~0.4GB of K/V per window-group member at
    640x360); rounded up to the mesh data-axis size."""
    env = os.environ.get("PROPAINTER_TPU_WINDOW_BATCH")
    cap = int(env) if env else 8
    g = min(n_windows, cap)
    return -(-g // dp) * dp


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
        rdtype = jnp.bfloat16 if config.raft_half else jnp.float32
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
        # progress callback: fn(stage_name, done_units, total_units)
        self.progress = None

    def _report(self, stage: str, done: int, total: int) -> None:
        progress_report(self.progress, stage, done, total)

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

    def _mp(self) -> int:
        if self.mesh is None:
            return 1
        from ..parallel.mesh import MODEL_AXIS

        return self.mesh.shape.get(MODEL_AXIS, 1)

    def _seq_selected(self, h: int) -> bool:
        """How the mp>1 window forward distributes over the model axis:
        T-sequence parallelism (parallel/sequence.py: tokens shard over
        T, attention all-gathers K/V — SURVEY §2.4b) vs spatial
        H-sharding (parallel/spatial.py — §2.4c). Sequence wins at low
        resolution where H-sharding leaves too few token rows per shard
        (at 640x360 the token grid is only ~30 rows; mp=4 H-shards are 7
        rows against a 5-row window + pooled-key gathers). H-sharding
        wins at >=720p where activations dominate and halo exchange
        amortizes. PROPAINTER_TPU_SEQ=1/0 forces the choice."""
        if self._mp() <= 1:
            return False
        env = os.environ.get("PROPAINTER_TPU_SEQ")
        if env is not None:
            return env == "1"
        return h < 512

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

    @staticmethod
    def _pad_chunk_axis(arrays: tuple, dp: int):
        """Pad the leading (chunk) axis to a multiple of dp by repeating
        the last chunk (traced; runs inside the stage program)."""
        c = arrays[0].shape[0]
        n_pad = (-c) % dp
        if n_pad:
            arrays = tuple(
                jnp.concatenate([a, jnp.repeat(a[-1:], n_pad, axis=0)])
                for a in arrays
            )
        return arrays

    # ------------------------------------------------------------- stage 1

    def _flow_fn(self, t: int, hw: tuple[int, int]):
        """Pure fn(raft_params, frames[1,T,H,W,3] fp32) -> (ff, fb)
        [1,T-1,H,W,2] fp32, with the chunk plan traced inside."""
        cfg = self.config
        bounds = flow_chunk_plan(cfg, t)
        clip = cfg.raft_chunk_len()
        chunk_len = clip + 1
        # all-pairs batching: RAFT flow pairs are independent — the
        # reference chunks only to bound GPU memory. One batch fills the
        # MXU better and traces one scan; gate on the correlation-volume
        # footprint (fp32 all-pairs + pyramid ~= 1.36x level 0).
        n_prob = 2 * (t - 1)
        h8w8 = (hw[0] // 8) * (hw[1] // 8)
        vol_bytes = n_prob * h8w8 * h8w8 * (2 if cfg.raft_half else 4) * 1.36
        allpairs = len(bounds) > 1 and vol_bytes <= float(
            os.environ.get("PROPAINTER_TPU_RAFT_ALLPAIRS_BYTES", 4.5e9)
        )
        clip_parallel = self._clip_parallel() and len(bounds) > 1
        n_chunks = len(bounds)

        def chunk_batch(frames):
            chunks = []
            for s, e in bounds:
                ck = frames[0, s:e]
                if e - s < chunk_len:
                    ck = jnp.concatenate(
                        [ck, jnp.repeat(ck[-1:], chunk_len - (e - s), axis=0)]
                    )
                chunks.append(ck)
            return jnp.stack(chunks)

        def unbatch(ff, fb):
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

        if len(bounds) == 1:
            return lambda prm, frames: raft.raft_bi_forward(
                prm, frames, iters=cfg.raft_iter
            )

        if allpairs and not clip_parallel:
            return lambda prm, frames: raft.raft_bi_forward(
                prm, frames, iters=cfg.raft_iter
            )

        if clip_parallel:
            dp = self._dp()
            inner = self._chunk_mapped(
                lambda prm, batch: raft.raft_bi_forward(
                    prm, batch, iters=cfg.raft_iter
                ),
                n_batched=1,
            )

            def f(prm, frames):
                batch = chunk_batch(frames)
                (batch,) = self._pad_chunk_axis((batch,), dp)
                ff, fb = inner(prm, batch)
                return unbatch(ff[:n_chunks], fb[:n_chunks])

            return f

        # batching every RAFT chunk into one call maximizes MXU occupancy
        # but keeps EVERY pair's [HW/64, HW/64] correlation volume live at
        # once — fine at 640x360 (~1.2GB bf16 for 46 pairs), catastrophic
        # at 720p+ (240f/80-chunk streaming: 88 probs x 14400^2 bf16 =
        # 36.6GB). Past the footprint gate the chunk axis runs as a
        # SEQUENTIAL lax.map (the reference's own memory strategy,
        # propainter_inference.py:75-93): one chunk's volumes live at a
        # time, one compiled body.
        chunk_probs = 2 * clip
        chunk_vol = chunk_probs * h8w8 * h8w8 * (
            2 if cfg.raft_half else 4
        ) * 1.36
        total_vol = chunk_vol * len(bounds)
        seq_budget = float(
            os.environ.get("PROPAINTER_TPU_RAFT_ALLPAIRS_BYTES", 4.5e9)
        )

        def f(prm, frames):
            if total_vol > seq_budget and chunk_vol <= seq_budget:
                # CHUNK-sequential map: the batched-all-chunks form blows
                # the volume budget (e.g. the 80-frame BASELINE config 3:
                # 7 chunks x 1.7GB), but ONE chunk's 24-prob batch fits —
                # map sequentially over chunks, keeping the MXU-filling
                # within-chunk batching (one compiled body, one chunk's
                # volumes live at a time). Mirrors the reference's own
                # chunk loop (propainter_inference.py:75-93).
                fdt = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
                # pre-cast to the RAFT compute dtype (identical numerics,
                # half the resident stacked-chunk buffer)
                batch = chunk_batch(frames).astype(
                    prm["fnet.conv1.weight"].dtype
                )  # [n_chunks, chunk_len, H, W, 3]
                ff, fb = jax.lax.map(
                    lambda ck: tuple(
                        a.astype(fdt)
                        for a in raft.raft_bi_forward(
                            prm, ck[None], iters=cfg.raft_iter
                        )
                    ),
                    batch,
                )
                return unbatch(ff[:, 0], fb[:, 0])
            if total_vol > seq_budget:
                # PER-PAIR sequential map: even one chunk's batched
                # volumes don't fit at 720p+ (the all-pairs einsum's f32
                # transient alone is ~1.7GB/prob); pairs are fully
                # independent, so this is exact. Flows leave the map in
                # the pipeline compute dtype — the same cast the
                # completion stage applies (reference half-cast,
                # propainter_inference.py:325-331) — halving the stacked
                # map output (f32 flows for 85 720p pairs are 2.5GB).
                fdt = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
                # index the frame array per pair instead of materializing
                # a [T-1, 2, H, W, 3] stacked copy (2GB f32 at 720p/85
                # pairs — part of the 240f 720p streaming OOM), and
                # pre-cast to the RAFT compute dtype (raft_bi_forward
                # casts its inputs to the params dtype anyway, so this is
                # numerically identical and halves the resident input)
                fr = frames[0].astype(prm["fnet.conv1.weight"].dtype)
                # past a second footprint gate even ONE pair's batched-
                # direction pyramid is too big (1080p: level-0 bf16 is
                # 2.1GB/direction and the batched build transposes and
                # concats it — peak >16GB); run the directions
                # sequentially so one pyramid is live at a time
                pair_vol = 2.0 * h8w8 * h8w8 * (
                    2 if cfg.raft_half else 4
                ) * 1.36
                seqdir = pair_vol > float(
                    os.environ.get("PROPAINTER_TPU_RAFT_SEQDIR_BYTES", 2e9)
                )
                pair_fn = (
                    raft.raft_bi_forward_seqdir if seqdir
                    else raft.raft_bi_forward
                )
                ff, fb = jax.lax.map(
                    lambda i: tuple(
                        a.astype(fdt)
                        for a in pair_fn(
                            prm,
                            jax.lax.dynamic_slice_in_dim(fr, i, 2, 0)[None],
                            iters=cfg.raft_iter,
                        )
                    ),
                    jnp.arange(t - 1),
                )
                return ff[:, 0, 0][None], fb[:, 0, 0][None]
            batch = chunk_batch(frames)
            ff, fb = raft.raft_bi_forward(prm, batch, iters=cfg.raft_iter)
            return unbatch(ff, fb)

        return f

    def compute_flow(self, frames: jnp.ndarray):
        """Bidirectional RAFT flow (propainter_inference.py:61-99).

        frames: [1, T, H, W, 3] in [-1, 1] fp32.
        Returns (flows_f, flows_b): [1, T-1, H, W, 2] fp32.
        ONE device dispatch (chunk loop traced inside).
        """
        t = frames.shape[1]
        hw = frames.shape[2:4]
        fn = self.jits.get(
            "flow_stage",
            (self.config.raft_iter, self.config.raft_chunk_len(), t) + hw,
            lambda: self._flow_fn(t, hw),
        )
        self._report("compute_flow", 0, 1)
        with stage_timer("compute_flow") as tm:
            out = tm.set(fn(self.raft_params, frames))
        self._report("compute_flow", 1, 1)
        return out

    # ------------------------------------------------------------- stage 2

    def _complete_fn(self, flow_length: int):
        """Pure fn(flow_params, ff, fb, masks) -> completed (ff, fb);
        subvideo chunking + halos traced inside."""
        dt = self.cdtype

        def one_chunk(prm, ff, fb, mk, t_real, t_static):
            n_pad = t_static - t_real
            if n_pad:
                padf = ((0, 0), (0, n_pad), (0, 0), (0, 0), (0, 0))
                ff = jnp.pad(ff, padf)
                fb = jnp.pad(fb, padf)
                mk = jnp.pad(mk, padf)
            pf, pb = fc.forward_bidirect_flow(
                prm, ff, fb, mk, jnp.asarray(t_real) if n_pad else None
            )
            of, ob = fc.combine_flow(ff, fb, pf, pb, mk)
            return of[:, :t_real], ob[:, :t_real]

        sub = self.config.subvideo_length
        if flow_length <= sub:
            def f(prm, flows_f, flows_b, flow_masks):
                return one_chunk(
                    prm,
                    flows_f.astype(dt),
                    flows_b.astype(dt),
                    flow_masks.astype(dt),
                    flow_length,
                    flow_length,
                )

            return f

        bounds, chunk_static = complete_chunk_plan(self.config, flow_length)
        clip_parallel = self._clip_parallel() and len(bounds) > 1

        if clip_parallel:
            dp = self._dp()
            inner = self._chunk_mapped(
                lambda prm, ff, fb, mk, tv: fc.combine_flow(
                    ff, fb, *fc.forward_bidirect_flow(prm, ff, fb, mk, tv), mk
                ),
                n_batched=4,
            )

            def f(prm, flows_f, flows_b, flow_masks):
                flows_f = flows_f.astype(dt)
                flows_b = flows_b.astype(dt)
                flow_masks = flow_masks.astype(dt)

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
                ffs, fbs, mks, tvs = self._pad_chunk_axis(
                    (ffs, fbs, mks, tvs), dp
                )
                of, ob = inner(prm, ffs, fbs, mks, tvs)
                out_f, out_b = [], []
                for ci, (s_f, e_f, ps, pe) in enumerate(bounds):
                    end = e_f - s_f - pe
                    out_f.append(of[ci : ci + 1, ps:end])
                    out_b.append(ob[ci : ci + 1, ps:end])
                return (
                    jnp.concatenate(out_f, axis=1),
                    jnp.concatenate(out_b, axis=1),
                )

            return f

        def f(prm, flows_f, flows_b, flow_masks):
            flows_f = flows_f.astype(dt)
            flows_b = flows_b.astype(dt)
            flow_masks = flow_masks.astype(dt)
            out_f, out_b = [], []
            for s_f, e_f, pad_len_s, pad_len_e in bounds:
                of, ob = one_chunk(
                    prm,
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

        return f

    def complete_flow(self, flows, flow_masks):
        """Flow completion, subvideo chunks with 5-frame halo
        (propainter_inference.py:102-156). ONE device dispatch.

        flows: (flows_f, flows_b) [1, T-1, H, W, 2]; flow_masks
        [1, T, H, W, 1]. Returns completed (flows_f, flows_b).
        """
        flows_f, flows_b = flows
        flow_length = flows_f.shape[1]
        fn = self.jits.get(
            "complete_stage",
            (self.config.subvideo_length, flow_length) + flows_f.shape[2:4],
            lambda: self._complete_fn(flow_length),
        )
        self._report("complete_flow", 0, 1)
        with stage_timer("complete_flow") as tm:
            out = tm.set(fn(self.flow_params, flows_f, flows_b, flow_masks))
        self._report("complete_flow", 1, 1)
        return out

    # ------------------------------------------------------------- stage 3

    def _imgprop_fn(self, t: int):
        """Pure fn(frames, masks, ff, fb) -> (updated_frames, updated_masks);
        chunking + halos traced inside."""
        dt = self.cdtype

        def one_chunk(fr, mk, ff, fb, t_real, t_static):
            n_pad = t_static - t_real
            if n_pad:
                padf = ((0, 0), (0, n_pad), (0, 0), (0, 0), (0, 0))
                fr = jnp.pad(fr, padf)
                mk = jnp.pad(mk, padf)
                ff = jnp.pad(ff, padf)
                fb = jnp.pad(fb, padf)
            masked = fr * (1 - mk)
            prop, upd_mask = pp.bidirectional_propagation_image(
                masked, ff, fb, mk, "nearest",
                t_valid=jnp.asarray(t_real) if n_pad else None,
            )
            updated = fr * (1 - mk) + prop * mk
            return updated[:, :t_real], upd_mask[:, :t_real]

        sub = min(100, self.config.subvideo_length)
        if t <= sub:
            def f(frames, masks_dilated, flows_f, flows_b):
                return one_chunk(
                    frames.astype(dt),
                    masks_dilated.astype(dt),
                    flows_f.astype(dt),
                    flows_b.astype(dt),
                    t,
                    t,
                )

            return f

        bounds, chunk_static = imgprop_chunk_plan(self.config, t)
        clip_parallel = self._clip_parallel() and len(bounds) > 1

        if clip_parallel:
            dp = self._dp()

            def chunk_prog(fr, mk, ff, fb, tv):
                masked = fr * (1 - mk)
                prop, upd_mask = pp.bidirectional_propagation_image(
                    masked, ff, fb, mk, "nearest", t_valid=tv
                )
                return fr * (1 - mk) + prop * mk, upd_mask

            inner = self._chunk_mapped(chunk_prog, n_batched=5, n_rep=0)

            def f(frames, masks_dilated, flows_f, flows_b):
                frames = frames.astype(dt)
                masks_dilated = masks_dilated.astype(dt)
                flows_f = flows_f.astype(dt)
                flows_b = flows_b.astype(dt)

                def pad_t(a, target):
                    return jnp.pad(
                        a, ((0, 0), (0, target - a.shape[1])) + ((0, 0),) * 3
                    )

                frs = jnp.concatenate(
                    [pad_t(frames[:, s:e], chunk_static) for s, e, _, _ in bounds]
                )
                mks = jnp.concatenate(
                    [
                        pad_t(masks_dilated[:, s:e], chunk_static)
                        for s, e, _, _ in bounds
                    ]
                )
                ffs = jnp.concatenate(
                    [
                        pad_t(flows_f[:, s : e - 1], chunk_static - 1)
                        for s, e, _, _ in bounds
                    ]
                )
                fbs = jnp.concatenate(
                    [
                        pad_t(flows_b[:, s : e - 1], chunk_static - 1)
                        for s, e, _, _ in bounds
                    ]
                )
                tvs = jnp.asarray([e - s for s, e, _, _ in bounds])
                frs, mks, ffs, fbs, tvs = self._pad_chunk_axis(
                    (frs, mks, ffs, fbs, tvs), dp
                )
                uf, um = inner(frs, mks, ffs, fbs, tvs)
                out_frames, out_masks = [], []
                for ci, (s_f, e_f, ps, pe) in enumerate(bounds):
                    end = e_f - s_f - pe
                    out_frames.append(uf[ci : ci + 1, ps:end])
                    out_masks.append(um[ci : ci + 1, ps:end])
                return (
                    jnp.concatenate(out_frames, axis=1),
                    jnp.concatenate(out_masks, axis=1),
                )

            return f

        def f(frames, masks_dilated, flows_f, flows_b):
            frames = frames.astype(dt)
            masks_dilated = masks_dilated.astype(dt)
            flows_f = flows_f.astype(dt)
            flows_b = flows_b.astype(dt)
            out_frames, out_masks = [], []
            for s_f, e_f, pad_len_s, pad_len_e in bounds:
                uf, um = one_chunk(
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

        return f

    def image_propagation(self, frames, masks_dilated, pred_flows):
        """Pixel-domain propagation, <=100-frame chunks with 10-frame halo
        (propainter_inference.py:159-225). ONE device dispatch.

        frames [1, T, H, W, 3], masks_dilated [1, T, H, W, 1].
        Returns (updated_frames, updated_masks) in cdtype.
        """
        t = frames.shape[1]
        fn = self.jits.get(
            "imgprop_stage",
            (min(100, self.config.subvideo_length), t) + frames.shape[2:4],
            lambda: self._imgprop_fn(t),
        )
        self._report("image_propagation", 0, 1)
        with stage_timer("image_propagation") as tm:
            out = tm.set(fn(frames, masks_dilated, pred_flows[0], pred_flows[1]))
        self._report("image_propagation", 1, 1)
        return out

    # ------------------------------------------------------------- stage 4

    def _feature_fn(self, t: int, crop_hw: tuple[int, int] | None = None):
        """Pure fn(inpaint_params, updated_frames, updated_masks,
        masks_dilated, ff, fb, original_frames[, y0, x0]) -> composed
        [T, H, W, 3] float 0..255 (uint8-exact). The whole stage —
        window gathers, batched groups, uint8 composition, overlap
        blend — is one traced program.

        crop_hw (static (ch, cw), single-device only): decode/composite/
        blend only the mask-bbox crop at traced offsets (y0, x0) —
        decoder_crop is exact and the composed video equals the original
        outside the dilated mask, so the crop carries all information.
        The full-res decoder tail otherwise dominates the stage's HBM
        traffic."""
        cfg = self.config
        dt = self.cdtype
        (
            sels, valids, starts, lts, refs, slot_valid, l_t_max, ref_max
        ) = _window_tables(cfg, t)
        n_windows = sels.shape[0]

        dp = self._dp()
        mp = self._mp()
        group_size = _window_group_size(n_windows, dp)
        mesh = self.mesh
        # snapshot at trace time (baked into the program; part of the jit
        # key via _feature_key) — benches with no callback pay zero cost.
        # Requires backend host-callback support (the axon-tunneled TPU
        # has none; there, feature_propagation switches to the polled
        # per-group path instead — see _feature_polled).
        progress_on = self.progress is not None and callbacks_supported()

        def gather_group(
            enc_all, ds_ff_all, ds_fb_all, ds_md_all, ds_um_all,
            pool_all, md_p, orig_p, grp,
        ):
            """Window gathers from HOISTED per-frame features: every
            unique frame is encoded/downsampled ONCE (the reference
            re-encodes each window's frames — propainter_inference.py:275
            + model/propainter.py:376-385 — ~2.7x redundant at default
            window overlap). Numerically identical: the encoder and all
            downsampling are per-frame pure."""
            gsel = jnp.asarray(sels[grp])  # [G, T_sel]
            gvalid = jnp.asarray(valids[grp], dt)[:, :, None, None, None]
            gvl = gvalid[:, :l_t_max]
            gn0 = jnp.asarray(starts[grp])
            enc_sel = enc_all[gsel]
            ds_mi_sel = ds_md_all[gsel[:, :l_t_max]] * gvl
            ds_mu_sel = ds_um_all[gsel[:, :l_t_max]] * gvl
            pool_sel = pool_all[gsel[:, :l_t_max]] * gvl
            md_local = md_p[0, gsel[:, :l_t_max]] * gvl
            ds_ff = jax.vmap(
                lambda s: jax.lax.dynamic_slice_in_dim(
                    ds_ff_all, s, l_t_max - 1, 0
                )
            )(gn0)
            ds_fb = jax.vmap(
                lambda s: jax.lax.dynamic_slice_in_dim(
                    ds_fb_all, s, l_t_max - 1, 0
                )
            )(gn0)
            orig_slices = jax.vmap(
                lambda s: jax.lax.dynamic_slice_in_dim(orig_p, s, l_t_max, 0)
            )(gn0)
            return (
                enc_sel, ds_ff, ds_fb, ds_mi_sel, ds_mu_sel, pool_sel,
                md_local, orig_slices,
                jnp.asarray(lts[grp]), jnp.asarray(refs[grp]),
            )

        def fwd_features(
            prm, enc_sel, ds_ff, ds_fb, ds_mi_sel, ds_mu_sel, pool_sel,
            md_local, orig_slices, ltv, rfv, crop=None,
        ):
            """Window forward from gathered features + uint8 composite
            (propainter_inference.py:283-293). With `crop` ((y0, x0)
            traced; sizes from crop_hw) everything from the decoder down
            runs on the mask-bbox window only."""
            pred = pp.inpaint_generator_from_features(
                prm, enc_sel, ds_ff, ds_fb, ds_mi_sel, ds_mu_sel, pool_sel,
                l_t_max, orig_slices.shape[2:4],
                l_t_valid=ltv, ref_valid=rfv,
                crop=crop,
            )
            if crop is not None:
                y0c, x0c, chc, cwc = crop
                g_ = md_local.shape[0]
                md_local = jax.lax.dynamic_slice(
                    md_local, (0, 0, y0c, x0c, 0),
                    (g_, l_t_max, chc, cwc, 1),
                )
                orig_slices = jax.lax.dynamic_slice(
                    orig_slices, (0, 0, y0c, x0c, 0),
                    (g_, l_t_max, chc, cwc, 3),
                )
            pred = pred.astype(jnp.float32)
            pred_byte = jnp.floor((pred + 1.0) / 2.0 * 255.0)
            binary = md_local.astype(jnp.float32)
            return jnp.floor(pred_byte * binary + orig_slices * (1.0 - binary))

        def predict_group_hoisted(prm, args_h, md_p, orig_p, grp, crop=None):
            gathered = gather_group(*args_h, md_p, orig_p, grp)
            if mesh is not None and mp > 1:
                # model-axis window forward: either H-sharded (SURVEY
                # §2.4c — windows over "data", image height over "model",
                # GSPMD partitioning under the spatial_sharding
                # constraints active for the whole feature program) or
                # T-sequence-parallel (§2.4b — the transformer call
                # routes through parallel/sequence.py; the rest stays
                # windows-over-"data"). See _seq_selected.
                from jax.sharding import NamedSharding, PartitionSpec as P
                from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
                from ..parallel.sequence import sequence_active

                def sh(a, h_dim):
                    spec = [None] * a.ndim
                    spec[0] = DATA_AXIS
                    if h_dim is not None:
                        spec[h_dim] = MODEL_AXIS
                    return jax.lax.with_sharding_constraint(
                        a, NamedSharding(mesh, P(*spec))
                    )

                if sequence_active() is not None:
                    h_dims = (None,) * 10
                else:
                    h_dims = (2, 2, 2, 2, 2, 2, 2, 2, None, None)
                gathered = tuple(
                    sh(a, hd) for a, hd in zip(gathered, h_dims)
                )
                # crop decode composes with GSPMD: the crop slice is
                # H-local per shard and the partitioner inserts the
                # boundary collectives (VERDICT r4 weak #5 — the 1080p
                # sharded leg is where the full-res tail is biggest)
                return fwd_features(prm, *gathered, crop=crop)
            if mesh is not None and dp > 1:
                # windows shard over the mesh data axis; each device runs
                # the whole per-window forward (Pallas kernels included)
                # on its local windows. Crop offsets ride along as
                # replicated scalars (shard_map can't close over tracers).
                if crop is None:
                    return self._chunk_mapped(fwd_features, n_batched=10)(
                        prm, *gathered
                    )
                y0c, x0c, chc, cwc = crop

                def fwd_crop(prm_, y0_, x0_, *args):
                    return fwd_features(
                        prm_, *args, crop=(y0_, x0_, chc, cwc)
                    )

                return self._chunk_mapped(fwd_crop, n_batched=10, n_rep=3)(
                    prm, jnp.asarray(y0c), jnp.asarray(x0c), *gathered
                )
            return fwd_features(prm, *gathered, crop=crop)

        def predict_group(prm, uf_p, um_p, md_p, ff_p, fb_p, orig_p, grp):
            """Batched window prediction for a static group of window ids:
            model forward + uint8 composite (propainter_inference.py:283-293).
            Returns [G, l_t_max, H, W, 3] float 0..255."""
            gsel = jnp.asarray(sels[grp])  # [G, T_sel]
            gvalid = jnp.asarray(valids[grp], dt)[:, :, None, None, None]
            gn0 = jnp.asarray(starts[grp])
            sel_frames = uf_p[0, gsel]
            sel_masks = md_p[0, gsel] * gvalid
            sel_upd = um_p[0, gsel] * gvalid
            ff = jax.vmap(
                lambda s: jax.lax.dynamic_slice_in_dim(ff_p[0], s, l_t_max - 1, 0)
            )(gn0)
            fb = jax.vmap(
                lambda s: jax.lax.dynamic_slice_in_dim(fb_p[0], s, l_t_max - 1, 0)
            )(gn0)
            orig_slices = jax.vmap(
                lambda s: jax.lax.dynamic_slice_in_dim(orig_p, s, l_t_max, 0)
            )(gn0)

            def fwd(prm, sel_frames, sel_masks, sel_upd, ff, fb, orig_slices,
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

            if mesh is not None and mp > 1:
                # model axis > 1: the window forward runs under GSPMD with
                # the window batch sharded over "data" and the image
                # height over "model" (SURVEY §2.4c, parallel/spatial.py).
                # with_sharding_constraint pins the entry shardings; the
                # spatial_sharding context (active during this trace)
                # keeps H sharded at the model's stage boundaries and
                # swaps Pallas kernels for their partitionable XLA twins.
                from jax.sharding import NamedSharding, PartitionSpec as P
                from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
                from ..parallel.spatial import spatial_sharding

                def fwd_mp(prm, sel_frames, sel_masks, sel_upd, ff, fb,
                           orig_slices, l_t_valid, ref_valid):
                    def sh(a, h_dim):
                        spec = [None] * a.ndim
                        spec[0] = DATA_AXIS
                        spec[h_dim] = MODEL_AXIS
                        return jax.lax.with_sharding_constraint(
                            a, NamedSharding(mesh, P(*spec))
                        )

                    sel_frames = sh(sel_frames, 2)
                    sel_masks = sh(sel_masks, 2)
                    sel_upd = sh(sel_upd, 2)
                    ff = sh(ff, 2)
                    fb = sh(fb, 2)
                    orig_slices = sh(orig_slices, 2)
                    with spatial_sharding(mesh, MODEL_AXIS):
                        return fwd(
                            prm, sel_frames, sel_masks, sel_upd, ff, fb,
                            orig_slices, l_t_valid, ref_valid,
                        )

                return fwd_mp(
                    prm, sel_frames, sel_masks, sel_upd, ff, fb, orig_slices,
                    jnp.asarray(lts[grp]), jnp.asarray(refs[grp]),
                )

            if mesh is not None and dp > 1:
                # shard_map's in_specs reshard the window batch onto the
                # mesh data axis (GSPMD inserts the placement collective)
                fwd = self._chunk_mapped(fwd, n_batched=8)
            return fwd(
                prm, sel_frames, sel_masks, sel_upd, ff, fb, orig_slices,
                jnp.asarray(lts[grp]), jnp.asarray(refs[grp]),
            )

        def blend(imgs):
            return _blend_windows(
                imgs, jnp.asarray(starts), jnp.asarray(slot_valid), t, l_t_max
            )

        def f(prm, updated_frames, updated_masks, masks_dilated, flows_f,
              flows_b, original_frames, y0=None, x0=None):
            crop = None if crop_hw is None else (y0, x0) + tuple(crop_hw)
            updated_frames = updated_frames.astype(dt)
            updated_masks = updated_masks.astype(dt)
            masks_dilated = masks_dilated.astype(dt)
            flows_f = flows_f.astype(dt)
            flows_b = flows_b.astype(dt)

            pad_t = ((0, 0), (0, l_t_max), (0, 0), (0, 0), (0, 0))
            uf_p = jnp.pad(updated_frames, pad_t)
            um_p = jnp.pad(updated_masks, pad_t)
            md_p = jnp.pad(masks_dilated, pad_t)
            ff_p = jnp.pad(flows_f, pad_t)
            fb_p = jnp.pad(flows_b, pad_t)
            orig_p = jnp.pad(
                original_frames.astype(jnp.float32),
                ((0, l_t_max), (0, 0), (0, 0), (0, 0)),
            )

            # per-frame pure work ONCE per unique frame, on every path
            # (PROPAINTER_TPU_HOIST=0 keeps the reference-shaped
            # per-window encode as a test oracle). With a mesh the
            # per-frame encode shards frames over "data" (and H over
            # "model" when mp>1); the window gathers all-gather the
            # features (GSPMD inserts the collective; enc_all is ~44MB
            # bf16 at 640x360 — cheap over ICI vs ~2.7x re-encode).
            hoist = os.environ.get("PROPAINTER_TPU_HOIST", "1") == "1"
            from contextlib import nullcontext

            if mesh is not None and mp > 1:
                from ..parallel.mesh import MODEL_AXIS

                if self._seq_selected(updated_frames.shape[2]):
                    from ..parallel.sequence import sequence_sharding

                    trace_ctx = sequence_sharding(mesh, MODEL_AXIS)
                else:
                    from ..parallel.spatial import spatial_sharding

                    trace_ctx = spatial_sharding(mesh, MODEL_AXIS)
            else:
                trace_ctx = nullcontext()

            with trace_ctx:
                if hoist:
                    h4 = updated_frames.shape[2] // 4
                    w4 = updated_frames.shape[3] // 4
                    seq_on = mesh is not None and mp > 1 and (
                        self._seq_selected(updated_frames.shape[2])
                    )

                    def frame_sharded(a, h_dim=None):
                        if mesh is None or (dp <= 1 and mp <= 1):
                            return a
                        from jax.sharding import (
                            NamedSharding, PartitionSpec as P,
                        )
                        from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

                        spec = [None] * a.ndim
                        if dp > 1:
                            spec[0] = DATA_AXIS
                        if mp > 1 and h_dim is not None and not seq_on:
                            spec[h_dim] = MODEL_AXIS
                        return jax.lax.with_sharding_constraint(
                            a, NamedSharding(mesh, P(*spec))
                        )

                    enc_all = frame_sharded(
                        pp.encode_features(
                            prm, uf_p[0, :t], md_p[0, :t], um_p[0, :t]
                        ),
                        1,
                    )
                    ds_ff_all = frame_sharded(
                        pp.downsample_flow(ff_p, h4, w4)[0], 1
                    )
                    ds_fb_all = frame_sharded(
                        pp.downsample_flow(fb_p, h4, w4)[0], 1
                    )
                    ds_md_all = frame_sharded(
                        pp.downsample_mask(md_p, h4, w4)[0], 1
                    )
                    ds_um_all = frame_sharded(
                        pp.downsample_mask(um_p, h4, w4)[0], 1
                    )
                    pool_all = frame_sharded(
                        pp.attention_pool_mask(ds_md_all[None])[0], 1
                    )
                    # gsel pad slots index frame 0; pad the T axis for the
                    # dynamic flow slices only (gathers stay in-range)
                    args_h = (
                        enc_all, ds_ff_all, ds_fb_all, ds_md_all, ds_um_all,
                        pool_all,
                    )

                imgs = []
                for g0 in range(0, n_windows, group_size):
                    grp = list(range(g0, min(n_windows, g0 + group_size)))
                    done = grp[-1] + 1
                    grp = grp + [grp[-1]] * (group_size - len(grp))
                    if hoist:
                        out = predict_group_hoisted(
                            prm, args_h, md_p, orig_p, grp, crop=crop
                        )
                    else:
                        assert crop is None, (
                            "crop decode requires the hoisted path"
                        )
                        out = predict_group(
                            prm, uf_p, um_p, md_p, ff_p, fb_p, orig_p, grp
                        )
                    if progress_on:
                        # runtime tick: fires as the device finishes this
                        # group (the scalar arg makes it data-dependent on
                        # the group's output)
                        jax.debug.callback(
                            lambda _x, d=done: self._report(
                                "feature_windows", int(d), n_windows
                            ),
                            out[0, 0, 0, 0, 0],
                        )
                    imgs.append(out[: min(n_windows, g0 + group_size) - g0])
            return blend(jnp.concatenate(imgs, axis=0))

        return f

    def _poll_progress(self, t: int) -> bool:
        """Whether the feature stage should run as per-group dispatches
        with host-side progress ticks: a progress callback is set, the
        backend can't run host callbacks from traced programs (the
        axon-tunneled TPU), and there is more than one window group to
        report on. Trades a few dispatches for visibility (VERDICT r3
        weak #8); PROPAINTER_TPU_POLL_PROGRESS=0 opts out."""
        if self.progress is None or callbacks_supported():
            return False
        if os.environ.get("PROPAINTER_TPU_POLL_PROGRESS", "1") == "0":
            return False
        if self.mesh is not None:
            return False
        n_windows = len(window_plan(self.config, t))
        return n_windows > _window_group_size(n_windows, self._dp())

    def _feature_prep_fn(self, t: int, l_t_max: int):
        """Hoisted per-frame features + padded stage tensors as one
        program (the polled path's first dispatch)."""
        dt = self.cdtype

        def f(prm, updated_frames, updated_masks, masks_dilated, flows_f,
              flows_b, original_frames):
            updated_frames = updated_frames.astype(dt)
            updated_masks = updated_masks.astype(dt)
            masks_dilated = masks_dilated.astype(dt)
            flows_f = flows_f.astype(dt)
            flows_b = flows_b.astype(dt)
            pad_t = ((0, 0), (0, l_t_max), (0, 0), (0, 0), (0, 0))
            uf_p = jnp.pad(updated_frames, pad_t)
            um_p = jnp.pad(updated_masks, pad_t)
            md_p = jnp.pad(masks_dilated, pad_t)
            ff_p = jnp.pad(flows_f, pad_t)
            fb_p = jnp.pad(flows_b, pad_t)
            orig_p = jnp.pad(
                original_frames.astype(jnp.float32),
                ((0, l_t_max), (0, 0), (0, 0), (0, 0)),
            )
            h4 = updated_frames.shape[2] // 4
            w4 = updated_frames.shape[3] // 4
            enc_all = pp.encode_features(
                prm, uf_p[0, :t], md_p[0, :t], um_p[0, :t]
            )
            ds_ff_all = pp.downsample_flow(ff_p, h4, w4)[0]
            ds_fb_all = pp.downsample_flow(fb_p, h4, w4)[0]
            ds_md_all = pp.downsample_mask(md_p, h4, w4)[0]
            ds_um_all = pp.downsample_mask(um_p, h4, w4)[0]
            pool_all = pp.attention_pool_mask(ds_md_all[None])[0]
            return (
                enc_all, ds_ff_all, ds_fb_all, ds_md_all, ds_um_all,
                pool_all, md_p, orig_p,
            )

        return f

    def _feature_group_fn(self, l_t_max: int):
        """One window group as its own program, with the window tables
        TRACED (gsel/gvalid/gn0/ltv/rfv as arrays) so one compile serves
        every group of the clip."""
        dt = self.cdtype

        def f(prm, enc_all, ds_ff_all, ds_fb_all, ds_md_all, ds_um_all,
              pool_all, md_p, orig_p, gsel, gvalid, gn0, ltv, rfv):
            gvalid = gvalid.astype(dt)[:, :, None, None, None]
            gvl = gvalid[:, :l_t_max]
            enc_sel = enc_all[gsel]
            ds_mi_sel = ds_md_all[gsel[:, :l_t_max]] * gvl
            ds_mu_sel = ds_um_all[gsel[:, :l_t_max]] * gvl
            pool_sel = pool_all[gsel[:, :l_t_max]] * gvl
            md_local = md_p[0, gsel[:, :l_t_max]] * gvl
            ds_ff = jax.vmap(
                lambda s: jax.lax.dynamic_slice_in_dim(
                    ds_ff_all, s, l_t_max - 1, 0
                )
            )(gn0)
            ds_fb = jax.vmap(
                lambda s: jax.lax.dynamic_slice_in_dim(
                    ds_fb_all, s, l_t_max - 1, 0
                )
            )(gn0)
            orig_slices = jax.vmap(
                lambda s: jax.lax.dynamic_slice_in_dim(orig_p, s, l_t_max, 0)
            )(gn0)
            pred = pp.inpaint_generator_from_features(
                prm, enc_sel, ds_ff, ds_fb, ds_mi_sel, ds_mu_sel, pool_sel,
                l_t_max, orig_p.shape[1:3],
                l_t_valid=ltv, ref_valid=rfv,
            )
            pred = pred.astype(jnp.float32)
            pred_byte = jnp.floor((pred + 1.0) / 2.0 * 255.0)
            binary = md_local.astype(jnp.float32)
            return jnp.floor(pred_byte * binary + orig_slices * (1.0 - binary))

        return f

    def _feature_polled(
        self, updated_frames, updated_masks, masks_dilated, pred_flows,
        original_frames,
    ):
        """Feature stage as per-group dispatches with host progress ticks
        between them (backends without host-callback support). Each tick
        fetches one 4-byte scalar to make it truthful; the dispatches per
        group are the visibility cost (see _poll_progress)."""
        t = updated_frames.shape[1]
        cfg = self.config
        (
            sels, valids, starts, lts, refs, slot_valid, l_t_max, ref_max
        ) = _window_tables(cfg, t)
        n_windows = sels.shape[0]
        group_size = _window_group_size(n_windows, 1)
        hw = tuple(updated_frames.shape[2:4])

        prep = self.jits.get(
            "feature_poll_prep", (t, l_t_max) + hw,
            lambda: self._feature_prep_fn(t, l_t_max),
        )
        group_fn = self.jits.get(
            "feature_poll_group",
            (t, group_size, l_t_max, ref_max) + hw,
            lambda: self._feature_group_fn(l_t_max),
        )

        def build_blend():
            st = jnp.asarray(starts)
            sv = jnp.asarray(slot_valid)
            return lambda imgs: _blend_windows(imgs, st, sv, t, l_t_max)

        blend_fn = self.jits.get(
            "feature_poll_blend", (t, n_windows, l_t_max) + hw, build_blend
        )

        self._report("feature_propagation", 0, n_windows)
        with stage_timer("feature_propagation") as tm:
            args = prep(
                self.inpaint_params, updated_frames, updated_masks,
                masks_dilated, pred_flows[0], pred_flows[1], original_frames,
            )
            imgs = []
            for g0 in range(0, n_windows, group_size):
                grp = list(range(g0, min(n_windows, g0 + group_size)))
                done = grp[-1] + 1
                grp = grp + [grp[-1]] * (group_size - len(grp))
                out = group_fn(
                    self.inpaint_params, *args,
                    jnp.asarray(sels[grp]), jnp.asarray(valids[grp]),
                    jnp.asarray(starts[grp]), jnp.asarray(lts[grp]),
                    jnp.asarray(refs[grp]),
                )
                np.asarray(jnp.max(out[0, 0, 0, 0]))  # truthful tick
                self._report("feature_propagation", done, n_windows)
                imgs.append(out[: min(n_windows, g0 + group_size) - g0])
            out = tm.set(blend_fn(jnp.concatenate(imgs, axis=0)))
        self._report("feature_propagation", n_windows, n_windows)
        return out

    def feature_propagation(
        self,
        updated_frames,
        updated_masks,
        masks_dilated,
        pred_flows,
        original_frames,
    ):
        """Sliding-window transformer inference + on-device composition +
        overlap blend (propainter_inference.py:228-311). ONE dispatch
        (or per-group dispatches with progress ticks — _poll_progress).

        original_frames: [T, H, W, 3] float 0..255 integer-valued.
        Returns composed video [T, H, W, 3] float 0..255 (uint8-exact).
        """
        t = updated_frames.shape[1]
        if self._poll_progress(t):
            return self._feature_polled(
                updated_frames, updated_masks, masks_dilated, pred_flows,
                original_frames,
            )
        fn = self.jits.get(
            "feature_stage",
            self._feature_key(t) + updated_frames.shape[2:4],
            lambda: self._feature_fn(t),
        )
        n_windows = len(window_plan(self.config, t))
        self._report("feature_propagation", 0, n_windows)
        with stage_timer("feature_propagation") as tm:
            out = tm.set(fn(
                self.inpaint_params, updated_frames, updated_masks,
                masks_dilated, pred_flows[0], pred_flows[1], original_frames,
            ))
        self._report("feature_propagation", n_windows, n_windows)
        return out

    def _feature_key(self, t: int) -> tuple:
        cfg = self.config
        return (
            t, cfg.neighbor_length, cfg.ref_stride, cfg.subvideo_length,
            _window_group_size(len(window_plan(cfg, t)), self._dp()),
            self._mp(),
            self.progress is not None and callbacks_supported(),
            os.environ.get("PROPAINTER_TPU_HOIST", "1"),
            os.environ.get("PROPAINTER_TPU_SEQ"),
            os.environ.get("PROPAINTER_TPU_CROP_DECODE", "1"),
        )

    # ------------------------------------------- streaming chunk programs
    #
    # pipeline/streaming.py drives long videos chunk-by-chunk with a
    # bounded working set; these single-chunk programs (zero-padded to a
    # static length, exact via scan resets + attention key masks) are its
    # building blocks. One compile per static chunk shape.

    def complete_flow_chunk(self, ff, fb, mk, t_real, t_static):
        """One flow-completion chunk, zero-padded to the static length.

        At high resolution the two directions run as SEPARATE dispatches
        with a sync between (exact — forward_bidirect_flow's seq_dirs
        path already runs them sequentially inside one program, but one
        1080p direction peaks ~9GB and having both programs' buffer sets
        in flight at one deferred-execution sync exceeds HBM)."""
        dt = self.cdtype

        n_pad = t_static - t_real
        pw, ph = self.config.process_size
        if ph * pw <= 640 * 480:
            if n_pad:
                padf = ((0, 0), (0, n_pad), (0, 0), (0, 0), (0, 0))
                ff = jnp.pad(ff, padf)
                fb = jnp.pad(fb, padf)
                mk = jnp.pad(mk, padf)

            def build():
                def f(prm, ff, fb, mk, t_valid):
                    pf, pb = fc.forward_bidirect_flow(prm, ff, fb, mk, t_valid)
                    return fc.combine_flow(ff, fb, pf, pb, mk)

                return f

            fn = self.jits.get("flow_complete_chunk", ff.shape[1:], build)
            with stage_timer("complete_flow") as tm:
                of, ob = tm.set(fn(
                    self.flow_params, ff.astype(dt), fb.astype(dt),
                    mk.astype(dt), jnp.asarray(t_real),
                ))
            return of[:, :t_real], ob[:, :t_real]

        # high-res: pad INSIDE the jit (eager padded copies of ff/fb/mk
        # were ~1.9GB of residents held across both dispatches), and
        # return the unpadded tail directly
        padf = ((0, 0), (0, n_pad), (0, 0), (0, 0), (0, 0))

        def build_fwd():
            def f(prm, ff, mk, t_valid):
                ff = jnp.pad(ff, padf) if n_pad else ff
                mk = jnp.pad(mk, padf) if n_pad else mk
                masks_fwd = mk[:, :-1]
                mf = ff * (1 - masks_fwd)
                pf = fc.flow_complete_forward(prm, mf, masks_fwd, t_valid)
                # combine_flow, forward half (reference :389-400)
                out = pf * masks_fwd + ff * (1 - masks_fwd)
                return out[:, :t_real]

            return f

        def build_bwd():
            def f(prm, fb, mk, t_valid):
                fb = jnp.pad(fb, padf) if n_pad else fb
                mk = jnp.pad(mk, padf) if n_pad else mk
                t = fb.shape[1]
                masks_bwd = mk[:, 1:]
                mb = fb * (1 - masks_bwd)
                # flip only the real prefix (padding stays at the end) —
                # same as forward_bidirect_flow's scalar-t_valid flip
                tv = jnp.asarray(t_valid)
                ar = jnp.arange(t)
                idx = jnp.where(ar < tv, tv - 1 - ar, ar)
                flip = lambda a: jnp.take(a, idx, axis=1)
                pb = flip(
                    fc.flow_complete_forward(prm, flip(mb), flip(masks_bwd), tv)
                )
                out = pb * masks_bwd + fb * (1 - masks_bwd)
                return out[:, :t_real]

            return f

        def _sync(a):
            # one retry: the shared remote-compile service intermittently
            # 500s on fresh tiny programs (round-4/5 notes); the data is
            # fine and a second request usually lands
            import time as _time

            for attempt in (0, 1):
                try:
                    np.asarray(jnp.max(a))
                    return
                except Exception:
                    if attempt:
                        raise
                    _time.sleep(20)

        key = ff.shape[1:] + (t_static,)
        fn_f = self.jits.get("flow_complete_chunk_f", key, build_fwd)
        fn_b = self.jits.get("flow_complete_chunk_b", key, build_bwd)
        tv = jnp.asarray(t_real)
        with stage_timer("complete_flow") as tm:
            of = fn_f(self.flow_params, ff.astype(dt), mk.astype(dt), tv)
            _sync(of)
            ob = fn_b(self.flow_params, fb.astype(dt), mk.astype(dt), tv)
            _sync(ob)
            tm.set((of, ob))
        return of, ob

    def image_prop_chunk(self, fr, mk, ff, fb, t_real, t_static):
        """One image-propagation chunk, zero-padded to the static length."""
        dt = self.cdtype

        def build():
            def f(fr, mk, ff, fb, t_valid):
                masked = fr * (1 - mk)
                prop, upd_mask = pp.bidirectional_propagation_image(
                    masked, ff, fb, mk, "nearest", t_valid=t_valid
                )
                return fr * (1 - mk) + prop * mk, upd_mask

            return f

        fr = fr.astype(dt)
        mk = mk.astype(dt)
        ff = ff.astype(dt)
        fb = fb.astype(dt)
        n_pad = t_static - t_real
        if n_pad:
            padf = ((0, 0), (0, n_pad), (0, 0), (0, 0), (0, 0))
            fr = jnp.pad(fr, padf)
            mk = jnp.pad(mk, padf)
            ff = jnp.pad(ff, padf)
            fb = jnp.pad(fb, padf)
        fn = self.jits.get("img_prop_chunk", fr.shape[1:], build)
        with stage_timer("image_propagation") as tm:
            uf, um = tm.set(fn(fr, mk, ff, fb, jnp.asarray(t_real)))
        return uf[:, :t_real], um[:, :t_real]

    def feature_window_fn(self, l_t_max: int, ref_max: int, hw: tuple):
        """Jitted one-window transformer + uint8 composite + overlap blend
        (compiled once per (l_t_max, ref_max, H, W)); used by streaming."""

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

        return self.jits.get("feature_window", (l_t_max, ref_max) + tuple(hw), build)

    # ------------------------------------------------------------ full run

    def _fused_ok(self, t: int) -> bool:
        """The fully-fused single-program path covers every clip the
        staged path would run as single chunks per stage (flow-completion
        and image-propagation chunking only trigger past subvideo_length).
        RAFT chunking is folded in regardless (it has no semantics).
        Opt out with PROPAINTER_TPU_FUSED=0 (e.g. for stage-split
        instrumentation). When per-group progress polling is active
        (callback set, backend without host callbacks, >1 window group)
        the staged path runs instead so the feature stage can tick."""
        if os.environ.get("PROPAINTER_TPU_FUSED", "1") == "0":
            return False
        if self._poll_progress(t):
            return False
        return t <= self.config.subvideo_length and t <= 100

    def _process_fn(
        self, t: int, hw: tuple[int, int],
        crop_hw: tuple[int, int] | None = None,
    ):
        flow_fn = self._flow_fn(t, hw)
        complete_fn = self._complete_fn(t - 1)
        imgprop_fn = self._imgprop_fn(t)
        feature_fn = self._feature_fn(t, crop_hw)
        # optimization_barrier between stages: still ONE dispatch, but
        # XLA's whole-module passes stop optimizing across the stage
        # boundaries. The unbarriered fused module hits superlinear
        # compile behavior (~1400s vs ~60s for the 4 stages compiled
        # separately — BENCH_r03.json / scripts/probe_compile.py).
        barrier = os.environ.get("PROPAINTER_TPU_FUSE_BARRIER", "1") == "1"
        bar = jax.lax.optimization_barrier if barrier else (lambda x: x)

        def f(raft_prm, flow_prm, inpaint_prm, frames_norm, flow_masks,
              masks_dilated, original_frames, y0=None, x0=None):
            gt_f, gt_b = bar(flow_fn(raft_prm, frames_norm))
            pf, pb = bar(complete_fn(flow_prm, gt_f, gt_b, flow_masks))
            uf, um = bar(imgprop_fn(frames_norm, masks_dilated, pf, pb))
            extra = () if crop_hw is None else (y0, x0)
            return feature_fn(
                inpaint_prm, uf, um, masks_dilated, pf, pb, original_frames,
                *extra,
            )

        return f

    # ------------------------------------------- minimal-transfer node path
    #
    # The ComfyUI node's host<->device traffic dominates wall time when the
    # chip is remote (the reference never had this problem: its host IS the
    # GPU host). This path moves EVERYTHING on-device and transfers the
    # information-theoretic minimum:
    #   in:  uint8 frames + bit-packed masks (masks are binary; 8x);
    #   out: the composed video CROPPED to the mask's bounding box
    #        (composed == original outside the dilated mask, exactly —
    #        propainter_inference.py:294-307 composites pred*m + orig*(1-m)
    #        with a binary m, so only the crop carries information) plus
    #        bit-packed mask crops; the host pastes them back.

    def _node_fn(
        self, t: int, hw: tuple[int, int], crop_hw: tuple[int, int],
        dilates: tuple[int, int], mask_hw: tuple[int, int] | None,
    ):
        """Pure fn(raft_p, flow_p, inpaint_p, frames_u8, mask_in, y0, x0)
        -> (composed_crop_u8, flow_mask_bits, dilated_mask_bits).

        frames_u8: [T, H, W, 3] uint8 at process size and mask_in
        bit-packed [T, H, W//8] uint8 when mask_hw is None; when the host
        had no PIL, mask_hw=(mh, mw) and both arrive raw uint8 at input
        resolution to resize on device (prepare_frames semantics). y0/x0:
        traced crop offsets; crop_hw static."""
        from ..ops import binary_dilation
        from ..utils.image import resize_frames

        ph, pw = hw
        ch, cw = crop_hw
        fd, md = dilates

        def f(raft_prm, flow_prm, inpaint_prm, frames_u8, mask_in, y0, x0):
            byte = frames_u8.astype(jnp.float32)
            if mask_hw is not None:
                byte = resize_frames(byte, pw, ph)
            frames_norm = byte / 255.0 * 2.0 - 1.0
            if mask_hw is None:
                base = jnp.unpackbits(mask_in, axis=-1, count=pw).astype(
                    jnp.float32
                )
            else:
                r = resize_frames(
                    mask_in.astype(jnp.float32)[..., None], pw, ph
                )[..., 0]
                base = (r > 0.5).astype(jnp.float32)
            flow_masks = (binary_dilation(base, fd) if fd > 0 else base)[
                ..., None
            ]
            masks_dilated = (binary_dilation(base, md) if md > 0 else base)[
                ..., None
            ]
            # crop-aware feature tail: the decoder/composite/blend run on
            # the mask-bbox window only (exact; see _feature_fn), so the
            # program's full-res tail scales with the mask, not the frame
            use_crop = (
                os.environ.get("PROPAINTER_TPU_HOIST", "1") == "1"
                and os.environ.get("PROPAINTER_TPU_CROP_DECODE", "1") == "1"
                # decoder_crop's halo block must fit inside the frame
                and ch + 4 * pp.DECODER_HALO4 * 2 <= ph
                and cw + 4 * pp.DECODER_HALO4 * 2 <= pw
            )
            if use_crop:
                comp_crop = self._process_fn(t, hw, (ch, cw))(
                    raft_prm, flow_prm, inpaint_prm, frames_norm[None],
                    flow_masks[None], masks_dilated[None], byte, y0, x0,
                ).astype(jnp.uint8)
            else:
                composed = self._process_fn(t, hw)(
                    raft_prm, flow_prm, inpaint_prm, frames_norm[None],
                    flow_masks[None], masks_dilated[None], byte,
                )
                comp_crop = jax.lax.dynamic_slice(
                    composed, (0, y0, x0, 0), (t, ch, cw, 3)
                ).astype(jnp.uint8)
            fm_crop = jax.lax.dynamic_slice(
                flow_masks[..., 0], (0, y0, x0), (t, ch, cw)
            )
            md_crop = jax.lax.dynamic_slice(
                masks_dilated[..., 0], (0, y0, x0), (t, ch, cw)
            )
            fm_bits = jnp.packbits((fm_crop > 0).astype(jnp.uint8), axis=-1)
            md_bits = jnp.packbits((md_crop > 0).astype(jnp.uint8), axis=-1)
            # ONE packed uint8 buffer: each device->host fetch pays ~35ms
            # of tunnel round-trip on top of the ~25-35 MB/s download;
            # three separate arrays tripled that fixed cost
            return jnp.concatenate(
                [comp_crop.ravel(), fm_bits.ravel(), md_bits.ravel()]
            )

        return f

    def _prep_fn(
        self, t: int, hw: tuple[int, int], dilates: tuple[int, int],
        mask_hw: tuple[int, int] | None,
    ):
        """Prep-only program for clips too long to fuse end-to-end."""
        from ..ops import binary_dilation
        from ..utils.image import resize_frames

        ph, pw = hw
        fd, md = dilates

        def f(frames_u8, mask_in):
            byte = frames_u8.astype(jnp.float32)
            if mask_hw is not None:
                byte = resize_frames(byte, pw, ph)
            frames_norm = byte / 255.0 * 2.0 - 1.0
            if mask_hw is None:
                base = jnp.unpackbits(mask_in, axis=-1, count=pw).astype(
                    jnp.float32
                )
            else:
                r = resize_frames(
                    mask_in.astype(jnp.float32)[..., None], pw, ph
                )[..., 0]
                base = (r > 0.5).astype(jnp.float32)
            flow_masks = (binary_dilation(base, fd) if fd > 0 else base)[
                ..., None
            ]
            masks_dilated = (binary_dilation(base, md) if md > 0 else base)[
                ..., None
            ]
            return frames_norm, byte, flow_masks, masks_dilated

        return f

    def _finalize_fn(self, t: int, crop_hw: tuple[int, int]):
        ch, cw = crop_hw

        def f(composed, flow_masks, masks_dilated, y0, x0):
            comp_crop = jax.lax.dynamic_slice(
                composed, (0, y0, x0, 0), (t, ch, cw, 3)
            ).astype(jnp.uint8)
            fm_crop = jax.lax.dynamic_slice(
                flow_masks[0, ..., 0], (0, y0, x0), (t, ch, cw)
            )
            md_crop = jax.lax.dynamic_slice(
                masks_dilated[0, ..., 0], (0, y0, x0), (t, ch, cw)
            )
            fm_bits = jnp.packbits((fm_crop > 0).astype(jnp.uint8), axis=-1)
            md_bits = jnp.packbits((md_crop > 0).astype(jnp.uint8), axis=-1)
            return jnp.concatenate(
                [comp_crop.ravel(), fm_bits.ravel(), md_bits.ravel()]
            )

        return f

    def _node_outpaint_fn(
        self, t: int, hw: tuple[int, int], canvas_hw: tuple[int, int],
        resize: bool,
    ):
        """Pure fn(raft_p, flow_p, inpaint_p, frames_u8) -> tuple of the
        composed canvas's uint8 OUTPAINT BANDS (top, bottom, left, right —
        empty bands omitted). The interior equals the input bytes exactly
        (masks_dilated is 0 there), so the host pastes bands around the
        frames it already has. Ring geometry mirrors the reference's
        extrapolation (utils/image_utils.py:200-252)."""
        from ..utils.image import resize_frames

        ph, pw = hw
        chh, cww = canvas_hw
        h_start = (chh - ph) // 2
        w_start = (cww - pw) // 2
        dil_h = 4 if h_start > 10 else 0
        dil_w = 4 if w_start > 10 else 0

        def f(raft_prm, flow_prm, inpaint_prm, frames_u8):
            byte = frames_u8.astype(jnp.float32)
            if resize:
                byte = resize_frames(byte, pw, ph)
            canvas = jnp.zeros((t, chh, cww, 3), jnp.float32)
            canvas = jax.lax.dynamic_update_slice(
                canvas, byte, (0, h_start, w_start, 0)
            )
            flow_mask = jnp.ones((chh, cww), jnp.float32)
            flow_mask = flow_mask.at[
                h_start + dil_h : h_start + ph - dil_h,
                w_start + dil_w : w_start + pw - dil_w,
            ].set(0.0)
            mask_dilated = jnp.ones((chh, cww), jnp.float32)
            mask_dilated = mask_dilated.at[
                h_start : h_start + ph, w_start : w_start + pw
            ].set(0.0)
            fm = jnp.broadcast_to(
                flow_mask[None, :, :, None], (t, chh, cww, 1)
            )
            md = jnp.broadcast_to(
                mask_dilated[None, :, :, None], (t, chh, cww, 1)
            )
            frames_norm = canvas / 255.0 * 2.0 - 1.0
            composed = self._process_fn(t, canvas_hw)(
                raft_prm, flow_prm, inpaint_prm, frames_norm[None],
                fm[None], md[None], canvas,
            ).astype(jnp.uint8)
            bands = []
            if h_start:
                bands.append(composed[:, :h_start])
                bands.append(composed[:, chh - (chh - h_start - ph) :])
            if w_start:
                mid = composed[:, h_start : h_start + ph]
                bands.append(mid[:, :, :w_start])
                bands.append(mid[:, :, cww - (cww - w_start - pw) :])
            return tuple(bands)

        return f

    def process_node_outpaint(
        self, frames_u8, frame_hw: tuple[int, int], canvas_hw: tuple[int, int],
        resize: bool = False,
    ):
        """Outpaint node run with minimal transfers: uint8 frames up, the
        outpainted uint8 bands down (the ring masks are static geometry —
        the host rebuilds them with numpy, nothing is fetched).

        frame_hw: the pre-canvas (resized input) frame size (ph, pw);
        config.process_size is the CANVAS for outpainting."""
        t = frames_u8.shape[0]
        ph, pw = frame_hw
        cfg = self.config
        if self._fused_ok(t):
            key = (
                t, (ph, pw), canvas_hw, resize, cfg.raft_iter,
                cfg.raft_chunk_len(), self._feature_key(t),
            )
            fn = self.jits.get(
                "node_outpaint", key,
                lambda: self._node_outpaint_fn(t, (ph, pw), canvas_hw, resize),
            )
            self._report("process", 0, 1)
            with stage_timer("process_node_outpaint") as tm:
                out = tm.set(fn(
                    self.raft_params, self.flow_params, self.inpaint_params,
                    frames_u8,
                ))
            self._report("process", 1, 1)
            return out

        # long clips: staged stage programs between a canvas-prep program
        # and a band-slicing program
        from ..utils.image import extrapolate_frames

        chh, cww = canvas_hw
        h_start = (chh - ph) // 2
        w_start = (cww - pw) // 2

        def build_prep():
            from ..utils.image import resize_frames

            def f(frames_u8):
                byte = frames_u8.astype(jnp.float32)
                if resize:
                    byte = resize_frames(byte, pw, ph)
                return extrapolate_frames(byte / 255.0, pw, ph, cww, chh)

            return f

        prep = self.jits.get(
            "node_outpaint_prep", (t, (ph, pw), canvas_hw, resize), build_prep
        )
        canvas, fm, md = prep(frames_u8)
        original = jnp.floor(jnp.clip(canvas * 255.0, 0.0, 255.0))
        composed = self.process(canvas[None] * 2.0 - 1.0, fm[None], md[None], original)

        def build_bands():
            def f(composed):
                composed = composed.astype(jnp.uint8)
                bands = []
                if h_start:
                    bands.append(composed[:, :h_start])
                    bands.append(composed[:, chh - (chh - h_start - ph) :])
                if w_start:
                    mid = composed[:, h_start : h_start + ph]
                    bands.append(mid[:, :, :w_start])
                    bands.append(mid[:, :, cww - (cww - w_start - pw) :])
                return tuple(bands)

            return f

        fin = self.jits.get("node_outpaint_bands", (t, (ph, pw), canvas_hw), build_bands)
        return fin(composed)

    def process_node(
        self,
        frames_u8,
        mask_in,
        crop: tuple[int, int, int, int],
        dilates: tuple[int, int],
        mask_resize: tuple[int, int] | None = None,
    ):
        """Full node run with minimal transfers.

        frames_u8: [T, H, W, 3] uint8 (process size). mask_in: bit-packed
        [T, H, W//8] (or raw [T, mh, mw] uint8 when mask_resize=(mh, mw)).
        crop: (y0, x0, ch, cw) — the mask bounding box grown by the
        dilation radius, bucketed; ch/cw are static, y0/x0 traced.
        dilates: (flow_mask_dilates, mask_dilates).
        Returns ONE packed uint8 device array = [composed_crop
        [T,ch,cw,3] ++ flow_mask_bits ++ dilated_mask_bits
        [T,ch,cw//8]], raveled — fetch with np.asarray once and split
        with `unpack_node` (a single fetch avoids paying the tunnel
        round-trip three times).
        """
        t = frames_u8.shape[0]
        if mask_resize is None:
            ph, pw = frames_u8.shape[1], frames_u8.shape[2]
        else:  # device-resize path: frames arrive at input resolution
            pw, ph = self.config.process_size
        y0, x0, ch, cw = crop
        assert cw % 8 == 0, f"crop width {cw} must be a multiple of 8 (packbits)"
        y0 = jnp.asarray(y0, jnp.int32)
        x0 = jnp.asarray(x0, jnp.int32)
        hw = (ph, pw)
        cfg = self.config

        if self._fused_ok(t):
            key = (
                t, hw, (ch, cw), dilates, mask_resize, cfg.raft_iter,
                cfg.raft_chunk_len(), self._feature_key(t),
            )
            fn = self.jits.get(
                "node_fused", key,
                lambda: self._node_fn(t, hw, (ch, cw), dilates, mask_resize),
            )
            self._report("process", 0, 1)
            with stage_timer("process_node_fused") as tm:
                out = tm.set(fn(
                    self.raft_params, self.flow_params, self.inpaint_params,
                    frames_u8, mask_in, y0, x0,
                ))
            self._report("process", 1, 1)
            return out

        prep = self.jits.get(
            "node_prep", (t, hw, dilates, mask_resize),
            lambda: self._prep_fn(t, hw, dilates, mask_resize),
        )
        frames_norm, byte, flow_masks, masks_dilated = prep(frames_u8, mask_in)
        composed = self.process(
            frames_norm[None], flow_masks[None], masks_dilated[None], byte
        )
        fin = self.jits.get(
            "node_finalize", (t, hw, (ch, cw)),
            lambda: self._finalize_fn(t, (ch, cw)),
        )
        return fin(composed, flow_masks[None], masks_dilated[None], y0, x0)

    @staticmethod
    def unpack_node(packed: np.ndarray, t: int, ch: int, cw: int):
        """Split a fetched process_node buffer into (composed_crop_u8,
        flow_mask_bits, dilated_mask_bits)."""
        # packbits in _node_fn yields ceil(cw/8) bytes/row; the split
        # below assumes cw%8==0, an invariant _mask_crop_plan's 32-px
        # bucketing establishes far from this code — enforce it here
        # rather than silently misalign (ADVICE r4)
        assert cw % 8 == 0, f"crop width {cw} must be a multiple of 8"
        n1 = t * ch * cw * 3
        n2 = t * ch * (cw // 8)
        return (
            packed[:n1].reshape(t, ch, cw, 3),
            packed[n1 : n1 + n2].reshape(t, ch, cw // 8),
            packed[n1 + n2 :].reshape(t, ch, cw // 8),
        )

    def process(self, frames_norm, flow_masks, masks_dilated, original_frames):
        """Full process_inpainting + feature_propagation
        (propainter_inference.py:314-341, 228-311).

        frames_norm: [1, T, H, W, 3] fp32 in [-1, 1]
        flow_masks / masks_dilated: [1, T, H, W, 1]
        original_frames: [T, H, W, 3] float 0..255
        Returns composed [T, H, W, 3] float 0..255.

        For clips within one subvideo chunk this is ONE compiled XLA
        program (single dispatch); longer videos run the four stage
        programs (one dispatch each, chunk loops traced inside).
        """
        t = frames_norm.shape[1]
        if self._fused_ok(t):
            hw = frames_norm.shape[2:4]
            key = (
                t, hw, self.config.raft_iter, self.config.raft_chunk_len(),
                self._feature_key(t),
            )
            fn = self.jits.get("process_fused", key, lambda: self._process_fn(t, hw))
            self._report("process", 0, 1)
            with stage_timer("process_fused") as tm:
                out = tm.set(fn(
                    self.raft_params, self.flow_params, self.inpaint_params,
                    frames_norm, flow_masks, masks_dilated, original_frames,
                ))
            self._report("process", 1, 1)
            return out

        gt_flows = self.compute_flow(frames_norm)
        pred_flows = self.complete_flow(gt_flows, flow_masks)
        updated_frames, updated_masks = self.image_propagation(
            frames_norm, masks_dilated, pred_flows
        )
        return self.feature_propagation(
            updated_frames, updated_masks, masks_dilated, pred_flows, original_frames
        )
