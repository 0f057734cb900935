"""Golden parity: JAX RecurrentFlowCompleteNet vs the reference (random
weights, torchvision stubbed with a vectorized deform-conv oracle)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from oracles import install_reference_path, seed_torch_model, torch_deform_conv2d

install_reference_path()

from model.recurrent_flow_completion import (  # noqa: E402 (reference)
    RecurrentFlowCompleteNet,
)

from comfyui_propainter_nodes_tpu.utils.checkpoint import convert_state_dict
from comfyui_propainter_nodes_tpu.models import flow_completion as jfc


@pytest.fixture(scope="module")
def torch_model():
    m = RecurrentFlowCompleteNet()
    seed_torch_model(m, seed=0)
    m.eval()
    return m


@pytest.fixture(scope="module")
def jax_params(torch_model):
    return {
        k: jnp.asarray(v) for k, v in convert_state_dict(torch_model.state_dict()).items()
    }


def test_deform_oracle_vs_numpy():
    """The vectorized torch deform-conv used to stub torchvision must match
    the slow numpy oracle."""
    from test_ops_deform_dilate import _np_deform_conv2d

    rng = np.random.default_rng(0)
    n, cin, cout, g, h, w = 1, 8, 4, 2, 5, 6
    k = 9
    x = torch.from_numpy(rng.standard_normal((n, cin, h, w)).astype(np.float32))
    off = torch.from_numpy(
        (rng.standard_normal((n, 2 * g * k, h, w)) * 1.5).astype(np.float32)
    )
    mask = torch.from_numpy(rng.uniform(0, 1, (n, g * k, h, w)).astype(np.float32))
    wgt = torch.from_numpy(rng.standard_normal((cout, cin, 3, 3)).astype(np.float32))
    ref = _np_deform_conv2d(x.numpy(), off.numpy(), mask.numpy(), wgt.numpy(), None)
    out = torch_deform_conv2d(x, off, wgt, None, (1, 1), (1, 1), (1, 1), mask)
    np.testing.assert_allclose(out.numpy(), ref, atol=1e-4, rtol=1e-4)


def test_forward_parity(torch_model, jax_params):
    rng = np.random.default_rng(1)
    b, t, h, w = 1, 5, 64, 96  # t = number of flows
    flows = (rng.standard_normal((b, t, h, w, 2)) * 2).astype(np.float32)
    masks = (rng.uniform(size=(b, t, h, w, 1)) > 0.7).astype(np.float32)

    ft = torch.from_numpy(flows).permute(0, 1, 4, 2, 3)
    mt = torch.from_numpy(masks).permute(0, 1, 4, 2, 3)
    with torch.no_grad():
        ref, _ = torch_model.forward(ft, mt)
    ref = ref.permute(0, 1, 3, 4, 2).numpy()

    ours = np.asarray(
        jfc.flow_complete_forward(jax_params, jnp.asarray(flows), jnp.asarray(masks))
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_bidirect_and_combine_parity(torch_model, jax_params):
    rng = np.random.default_rng(2)
    b, t, h, w = 1, 6, 64, 64
    flows_f = (rng.standard_normal((b, t - 1, h, w, 2)) * 2).astype(np.float32)
    flows_b = (rng.standard_normal((b, t - 1, h, w, 2)) * 2).astype(np.float32)
    masks = (rng.uniform(size=(b, t, h, w, 1)) > 0.7).astype(np.float32)

    fft = torch.from_numpy(flows_f).permute(0, 1, 4, 2, 3)
    fbt = torch.from_numpy(flows_b).permute(0, 1, 4, 2, 3)
    mt = torch.from_numpy(masks).permute(0, 1, 4, 2, 3)
    with torch.no_grad():
        pred_bi, _ = torch_model.forward_bidirect_flow((fft, fbt), mt)
        comb = torch_model.combine_flow((fft, fbt), pred_bi, mt)
    ref_f = comb[0].permute(0, 1, 3, 4, 2).numpy()
    ref_b = comb[1].permute(0, 1, 3, 4, 2).numpy()

    pf, pb = jfc.forward_bidirect_flow(
        jax_params, jnp.asarray(flows_f), jnp.asarray(flows_b), jnp.asarray(masks)
    )
    of, ob = jfc.combine_flow(
        jnp.asarray(flows_f), jnp.asarray(flows_b), pf, pb, jnp.asarray(masks)
    )
    np.testing.assert_allclose(np.asarray(of), ref_f, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ob), ref_b, atol=5e-4, rtol=1e-3)


def test_chunked_forward_matches_unchunked(monkeypatch, jax_params):
    """The high-res memory path (temporal-halo-chunked encoder +
    frame-chunked decoder) must reproduce the all-frames-batched forward
    exactly: the halo absorbs the four dilated-2 temporal convs' +-8
    receptive field, synthetic halo frames are re-zeroed before every
    temporal conv, and the decoder is per-frame pure. Forcing the area
    gate low exercises it at test shapes, incl. an end-padded T."""
    from comfyui_propainter_nodes_tpu.models import flow_completion as jfc

    rng = np.random.default_rng(4)
    b, t, h, w = 1, 21, 64, 96  # t NOT a multiple of the chunk length
    flows = jnp.asarray(
        (rng.standard_normal((b, t, h, w, 2)) * 2).astype(np.float32)
    )
    masks = jnp.asarray(
        (rng.uniform(size=(b, t, h, w, 1)) > 0.7).astype(np.float32)
    )

    ref = jfc.flow_complete_forward(jax_params, flows, masks)
    monkeypatch.setenv("PROPAINTER_TPU_FC_CHUNK_AREA", "1")
    out = jfc.flow_complete_forward(jax_params, flows, masks)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4
    )

    # the 1080p regime's row-slabbed encoder (first/interior/last slab
    # geometry at h8=8 with nb=3) must also be exact
    monkeypatch.setenv("PROPAINTER_TPU_FC_BIGAREA", "1")
    monkeypatch.setenv("PROPAINTER_TPU_FC_SLAB_NB", "3")
    out4 = jfc.flow_complete_forward(jax_params, flows, masks)
    monkeypatch.delenv("PROPAINTER_TPU_FC_BIGAREA")
    monkeypatch.delenv("PROPAINTER_TPU_FC_SLAB_NB")
    np.testing.assert_allclose(
        np.asarray(out4), np.asarray(ref), atol=3e-5, rtol=1e-4
    )

    # end-padded sequence: real prefix must stay exact through chunking
    tv = 17
    fp = jnp.pad(flows, ((0, 0), (0, 5), (0, 0), (0, 0), (0, 0)))
    mp = jnp.pad(masks, ((0, 0), (0, 5), (0, 0), (0, 0), (0, 0)))
    out_p = jfc.flow_complete_forward(
        jax_params, fp[:, : t + 5], mp[:, : t + 5], t_valid=jnp.asarray(tv)
    )
    monkeypatch.delenv("PROPAINTER_TPU_FC_CHUNK_AREA")
    ref_p = jfc.flow_complete_forward(
        jax_params, fp[:, : t + 5], mp[:, : t + 5], t_valid=jnp.asarray(tv)
    )
    np.testing.assert_allclose(
        np.asarray(out_p[:, :tv]), np.asarray(ref_p[:, :tv]),
        atol=3e-5, rtol=1e-4,
    )


def test_sequential_directions_match_batched(monkeypatch, jax_params):
    """High-res mode runs the two temporal directions as sequential
    network calls; must equal the 2x-batched form exactly (no cross-
    batch coupling in the network)."""
    from comfyui_propainter_nodes_tpu.models import flow_completion as jfc

    rng = np.random.default_rng(6)
    b, t, h, w = 1, 9, 64, 96
    ff = jnp.asarray((rng.standard_normal((b, t - 1, h, w, 2)) * 2).astype(np.float32))
    fb = jnp.asarray((rng.standard_normal((b, t - 1, h, w, 2)) * 2).astype(np.float32))
    mk = jnp.asarray((rng.uniform(size=(b, t, h, w, 1)) > 0.7).astype(np.float32))

    ref = jfc.forward_bidirect_flow(jax_params, ff, fb, mk)
    monkeypatch.setenv("PROPAINTER_TPU_FC_CHUNK_AREA", "1")
    out = jfc.forward_bidirect_flow(jax_params, ff, fb, mk)
    for o, r in zip(out, ref):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), atol=3e-5, rtol=1e-4
        )
    # with an end-padded T (scalar t_valid)
    tv = 6
    ffp = jnp.pad(ff, ((0, 0), (0, 3), (0, 0), (0, 0), (0, 0)))
    fbp = jnp.pad(fb, ((0, 0), (0, 3), (0, 0), (0, 0), (0, 0)))
    mkp = jnp.pad(mk, ((0, 0), (0, 3), (0, 0), (0, 0), (0, 0)))
    out_p = jfc.forward_bidirect_flow(
        jax_params, ffp, fbp, mkp, t_valid=jnp.asarray(tv)
    )
    monkeypatch.delenv("PROPAINTER_TPU_FC_CHUNK_AREA")
    ref_p = jfc.forward_bidirect_flow(
        jax_params, ffp, fbp, mkp, t_valid=jnp.asarray(tv)
    )
    for o, r in zip(out_p, ref_p):
        np.testing.assert_allclose(
            np.asarray(o[:, :tv]), np.asarray(r[:, :tv]),
            atol=3e-5, rtol=1e-4,
        )

def test_complete_chunk_split_directions_matches_fused(jax_params):
    """The streaming completion chunk runs each direction as its own
    dispatch past the area gate (gated on config.process_size); forcing
    a big process_size with small inputs must reproduce the fused
    two-direction program, including an end-padded t_real."""
    from comfyui_propainter_nodes_tpu.config import PipelineConfig
    from comfyui_propainter_nodes_tpu.pipeline.stages import Pipeline
    from comfyui_propainter_nodes_tpu.utils import weights as wz

    rng = np.random.default_rng(7)
    t_real, t_static, h, w = 9, 12, 64, 96
    ff = jnp.asarray((rng.standard_normal((1, t_real, h, w, 2)) * 2).astype(np.float32))
    fb = jnp.asarray((rng.standard_normal((1, t_real, h, w, 2)) * 2).astype(np.float32))
    mk = jnp.asarray(
        (rng.uniform(size=(1, t_real + 1, h, w, 1)) > 0.7).astype(np.float32)
    )
    params = [
        wz.get_params(m, allow_random=True)
        for m in ("raft", "flow_completion", "inpaint_generator")
    ]
    cfg_small = PipelineConfig(fp16="disable", process_size=(w, h))
    cfg_big = PipelineConfig(fp16="disable", process_size=(1920, 1080))
    of_a, ob_a = Pipeline(*params, cfg_small).complete_flow_chunk(
        ff, fb, mk, t_real, t_static
    )
    of_b, ob_b = Pipeline(*params, cfg_big).complete_flow_chunk(
        ff, fb, mk, t_real, t_static
    )
    np.testing.assert_allclose(
        np.asarray(of_a), np.asarray(of_b), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ob_a), np.asarray(ob_b), atol=3e-5, rtol=1e-4
    )
