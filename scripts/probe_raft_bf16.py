"""raft_bf16 quality evidence (VERDICT r4 weak #2 / ADVICE r3 medium).

The reference pins RAFT fp32 even under fp16=enable
(/root/reference/utils/model_utils.py:55-58, half cast commented out);
our default follows the fp16 knob (config.py raft_half) for ~2x MXU
throughput on the conv-heavy update loop. This probe quantifies what
that deviation costs, with the available proxy (the real checkpoints
are unreachable in this air-gapped environment — the parity script's
bf16 leg fires the moment they aren't):

  1. flow EPE between the bf16-param and fp32-param RAFT_bi at
     raft_iter=20 on a STRUCTURED synthetic clip (smooth gradient
     background + moving high-contrast block — realistic spatial
     autocorrelation, unlike white noise), random weights;
  2. end-to-end pipeline SSIM/PSNR between raft_bf16=True and =False
     with everything else held at the fp16=enable default.

Prints one JSON line per measurement. Run on the TPU chip (or CPU with
PROBE_SMALL=1 for a reduced-size smoke).
"""

import json
import os
import sys

import numpy as np
import jax

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, _repo)

from scripts.parity_real_weights import psnr, ssim  # noqa: E402


def structured_clip(t, h, w):
    """bench.py's synthetic clip: gradient base + moving block + mask."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([yy / h, xx / w, (yy + xx) / (h + w)], axis=-1).astype(
        np.float32
    )
    frames = np.repeat(base[None], t, axis=0)
    masks = np.zeros((t, h, w), dtype=np.float32)
    for i in range(t):
        x0 = int(w * 0.2) + 3 * i
        y0 = int(h * 0.3) + i
        frames[i, y0 : y0 + h // 6, x0 : x0 + w // 8] = [1.0, 0.2, 0.2]
        masks[i, y0 : y0 + h // 6, x0 : x0 + w // 8] = 1.0
    return frames, masks


def main():
    small = os.environ.get("PROBE_SMALL", "0") == "1"
    t = 8 if not small else 4
    h, w = (360, 640) if not small else (64, 96)
    iters = int(os.environ.get("PROBE_RAFT_ITER", "20"))

    from comfyui_propainter_nodes_tpu.models import raft as jraft
    from comfyui_propainter_nodes_tpu.utils import weights as wz

    frames, masks = structured_clip(t, h, w)
    fr = jnp.asarray(frames * 2.0 - 1.0)[None]  # [1, T, H, W, 3] in [-1,1]

    params32 = {
        k: jnp.asarray(v)
        for k, v in wz.get_params("raft", allow_random=True).items()
    }
    params16 = {k: v.astype(jnp.bfloat16) for k, v in params32.items()}

    f32 = jax.jit(lambda p, x: jraft.raft_bi_forward(p, x, iters=iters))
    ff32, fb32 = f32(params32, fr)
    ff16, fb16 = f32(params16, fr)
    ff32, fb32, ff16, fb16 = map(np.asarray, (ff32, fb32, ff16, fb16))

    def epe(a, b):
        e = np.sqrt(((a.astype(np.float64) - b.astype(np.float64)) ** 2).sum(-1))
        return {
            "mean": float(e.mean()),
            "p99": float(np.percentile(e, 99)),
            "max": float(e.max()),
        }

    mag = float(np.sqrt((ff32.astype(np.float64) ** 2).sum(-1)).mean())
    print(
        json.dumps(
            {
                "probe": "raft_bf16_flow_epe",
                "iters": iters,
                "shape": [t, h, w],
                "fwd_epe_px": epe(ff32, ff16),
                "bwd_epe_px": epe(fb32, fb16),
                "mean_flow_mag_px": mag,
            }
        ),
        flush=True,
    )

    # end-to-end: full pipeline, fp16=enable, raft_bf16 True vs False
    from comfyui_propainter_nodes_tpu.config import PipelineConfig
    from comfyui_propainter_nodes_tpu.pipeline.stages import Pipeline

    cfg_base = dict(
        ref_stride=10 if not small else 4,
        neighbor_length=10 if not small else 4,
        subvideo_length=80,
        raft_iter=iters,
        fp16="enable",
        process_size=(w, h),
    )
    params = [
        wz.get_params(m, allow_random=True)
        for m in ("raft", "flow_completion", "inpaint_generator")
    ]
    md = jnp.asarray(masks)[None, ..., None]
    orig = jnp.asarray(frames * 255.0)

    outs = {}
    for flag in (False, True):
        cfg = PipelineConfig(**cfg_base, raft_bf16=flag)
        pipe = Pipeline(*params, cfg)
        outs[flag] = np.asarray(
            pipe.process(fr.astype(jnp.float32), md, md, orig)
        ).astype(np.float64)

    print(
        json.dumps(
            {
                "probe": "raft_bf16_end_to_end",
                "iters": iters,
                "shape": [t, h, w],
                "ssim": round(ssim(outs[False], outs[True]), 6),
                "psnr_db": round(psnr(outs[False], outs[True]), 2),
                "max_abs_u8": float(np.abs(outs[False] - outs[True]).max()),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
