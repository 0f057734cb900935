"""Static-shape padding must not change real-frame results.

These tests pin the compile-once-any-length contract: running a model on
an end-padded sequence with a traced valid count must reproduce the
unpadded result exactly (scan resets + zero padding + attention key
masking)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from oracles import install_reference_path, seed_torch_model

install_reference_path()

from model.recurrent_flow_completion import RecurrentFlowCompleteNet  # noqa: E402
from model.propainter import InpaintGenerator  # noqa: E402

from comfyui_propainter_nodes_tpu.utils.checkpoint import convert_state_dict
from comfyui_propainter_nodes_tpu.models import flow_completion as jfc
from comfyui_propainter_nodes_tpu.models import propainter as jpp


@pytest.fixture(scope="module")
def fc_params():
    m = RecurrentFlowCompleteNet()
    seed_torch_model(m, seed=0)
    return {k: jnp.asarray(v) for k, v in convert_state_dict(m.state_dict()).items()}


@pytest.fixture(scope="module")
def pp_params():
    m = InpaintGenerator(init_weights=False)
    seed_torch_model(m, seed=0)
    return {k: jnp.asarray(v) for k, v in convert_state_dict(m.state_dict()).items()}


def test_flow_completion_padded_equivalence(fc_params):
    rng = np.random.default_rng(0)
    b, t, h, w = 1, 5, 32, 40  # t real flows
    t_pad = 9
    flows_f = (rng.standard_normal((b, t, h, w, 2)) * 2).astype(np.float32)
    flows_b = (rng.standard_normal((b, t, h, w, 2)) * 2).astype(np.float32)
    masks = (rng.uniform(size=(b, t + 1, h, w, 1)) > 0.7).astype(np.float32)

    ref_f, ref_b = jfc.forward_bidirect_flow(
        fc_params, jnp.asarray(flows_f), jnp.asarray(flows_b), jnp.asarray(masks)
    )

    pad = ((0, 0), (0, t_pad - t), (0, 0), (0, 0), (0, 0))
    ff_p = jnp.asarray(np.pad(flows_f, pad))
    fb_p = jnp.asarray(np.pad(flows_b, pad))
    mk_p = jnp.asarray(np.pad(masks, ((0, 0), (0, t_pad - t), (0, 0), (0, 0), (0, 0))))
    out_f, out_b = jfc.forward_bidirect_flow(
        fc_params, ff_p, fb_p, mk_p, t_valid=jnp.asarray(t)
    )
    np.testing.assert_allclose(
        np.asarray(out_f[:, :t]), np.asarray(ref_f), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_b[:, :t]), np.asarray(ref_b), atol=1e-5
    )


def test_img_propagation_padded_equivalence(pp_params):
    rng = np.random.default_rng(1)
    b, t, h, w = 1, 5, 24, 32
    t_pad = 8
    frames = rng.uniform(-1, 1, (b, t, h, w, 3)).astype(np.float32)
    masks = (rng.uniform(size=(b, t, h, w, 1)) > 0.6).astype(np.float32)
    flows_f = (rng.standard_normal((b, t - 1, h, w, 2)) * 1.5).astype(np.float32)
    flows_b = (rng.standard_normal((b, t - 1, h, w, 2)) * 1.5).astype(np.float32)
    masked = frames * (1 - masks)

    ref_fr, ref_mk = jpp.img_propagation(
        jnp.asarray(masked), jnp.asarray(flows_f), jnp.asarray(flows_b),
        jnp.asarray(masks), "nearest",
    )

    padt = lambda a, n: np.pad(a, ((0, 0), (0, n)) + ((0, 0),) * (a.ndim - 2))
    of, om = jpp.bidirectional_propagation_image(
        jnp.asarray(padt(masked, t_pad - t)),
        jnp.asarray(padt(flows_f, t_pad - t)),
        jnp.asarray(padt(flows_b, t_pad - t)),
        jnp.asarray(padt(masks, t_pad - t)),
        "nearest",
        t_valid=jnp.asarray(t),
    )
    np.testing.assert_allclose(np.asarray(of[:, :t]), np.asarray(ref_fr), atol=1e-5)
    np.testing.assert_allclose(np.asarray(om[:, :t]), np.asarray(ref_mk), atol=1e-5)


def test_inpaint_generator_padded_equivalence(pp_params):
    rng = np.random.default_rng(2)
    b, l_t, n_ref, h, w = 1, 4, 2, 64, 72
    l_t_pad, ref_pad = 6, 4
    t = l_t + n_ref
    frames = rng.uniform(-1, 1, (b, t, h, w, 3)).astype(np.float32)
    masks_in = (rng.uniform(size=(b, t, h, w, 1)) > 0.7).astype(np.float32)
    masks_upd = (masks_in * (rng.uniform(size=masks_in.shape) > 0.5)).astype(
        np.float32
    )
    flows_f = (rng.standard_normal((b, l_t - 1, h, w, 2)) * 1.5).astype(np.float32)
    flows_b = (rng.standard_normal((b, l_t - 1, h, w, 2)) * 1.5).astype(np.float32)
    masked = frames * (1 - masks_in)

    ref = jpp.inpaint_generator_forward(
        pp_params,
        jnp.asarray(masked),
        jnp.asarray(flows_f),
        jnp.asarray(flows_b),
        jnp.asarray(masks_in),
        jnp.asarray(masks_upd),
        l_t,
    )

    # pad local block to l_t_pad and ref block to ref_pad (zeros); padded
    # slots' masks are zero by construction of np.zeros
    def pad_blocks(a):
        local = a[:, :l_t]
        refs = a[:, l_t:]
        z = lambda n: np.zeros((b, n) + a.shape[2:], a.dtype)
        return np.concatenate(
            [local, z(l_t_pad - l_t), refs, z(ref_pad - n_ref)], axis=1
        )

    padf = lambda a, n: np.pad(a, ((0, 0), (0, n), (0, 0), (0, 0), (0, 0)))
    out = jpp.inpaint_generator_forward(
        pp_params,
        jnp.asarray(pad_blocks(np.asarray(masked))),
        jnp.asarray(padf(flows_f, l_t_pad - l_t)),
        jnp.asarray(padf(flows_b, l_t_pad - l_t)),
        jnp.asarray(pad_blocks(np.asarray(masks_in))),
        jnp.asarray(pad_blocks(np.asarray(masks_upd))),
        l_t_pad,
        l_t_valid=jnp.asarray(l_t),
        ref_valid=jnp.asarray(n_ref),
    )
    np.testing.assert_allclose(
        np.asarray(out[:, :l_t]), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


def test_hoisted_feature_stage_matches_per_window_encode(monkeypatch):
    """predict_group_hoisted (per-frame encode ONCE, window gathers) ==
    predict_group (reference-shaped per-window encode), including windows
    with padded local/ref slots and a padded final window group.

    Pins the l_t_valid/ref_valid key-masking + scan-reset contract the
    hoisted path relies on for real-frame exactness (pad slots reuse
    frame 0's features computed with un-zeroed masks)."""
    from comfyui_propainter_nodes_tpu.config import PipelineConfig
    from comfyui_propainter_nodes_tpu.pipeline.stages import Pipeline
    from comfyui_propainter_nodes_tpu.utils import weights as wz

    # group size 3 over 8 windows -> the last group has a padded slot;
    # neighbor windows at the clip edges have padded local slots
    monkeypatch.setenv("PROPAINTER_TPU_WINDOW_BATCH", "3")

    t, h, w = 16, 48, 64
    rng = np.random.default_rng(5)
    frames = jnp.asarray(rng.uniform(-1, 1, (1, t, h, w, 3)).astype(np.float32))
    masks = jnp.zeros((1, t, h, w, 1)).at[:, :, 16:32, 20:44].set(1.0)
    orig = jnp.asarray(rng.uniform(0, 255, (t, h, w, 3)).astype(np.float32))

    cfg = PipelineConfig(
        ref_stride=4, neighbor_length=4, subvideo_length=80, raft_iter=1,
        fp16="disable", process_size=(w, h),
    )
    params = [
        wz.get_params(m, allow_random=True)
        for m in ("raft", "flow_completion", "inpaint_generator")
    ]

    monkeypatch.setenv("PROPAINTER_TPU_HOIST", "1")
    hoisted = Pipeline(*params, cfg).process(frames, masks, masks, orig)
    monkeypatch.setenv("PROPAINTER_TPU_HOIST", "0")
    per_window = Pipeline(*params, cfg).process(frames, masks, masks, orig)
    np.testing.assert_array_equal(np.asarray(hoisted), np.asarray(per_window))
