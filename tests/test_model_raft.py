"""Golden parity: JAX RAFT vs the reference PyTorch RAFT (random weights)."""

import argparse

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from oracles import install_reference_path, seed_torch_model

install_reference_path()

from model.modules.RAFT.raft import RAFT  # noqa: E402  (reference, read-only)

from comfyui_propainter_nodes_tpu.utils.checkpoint import convert_state_dict
from comfyui_propainter_nodes_tpu.models import raft as jraft


@pytest.fixture(scope="module")
def torch_raft():
    args = argparse.Namespace(
        small=False, mixed_precision=False, alternate_corr=False, dropout=0
    )
    m = RAFT(args)
    seed_torch_model(m, seed=0)
    m.eval()
    return m


@pytest.fixture(scope="module")
def jax_params(torch_raft):
    return {k: jnp.asarray(v) for k, v in convert_state_dict(torch_raft.state_dict()).items()}


def test_encoder_parity(torch_raft, jax_params):
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 128, 160, 3)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    with torch.no_grad():
        ref_f = torch_raft.fnet(xt).permute(0, 2, 3, 1).numpy()
        ref_c = torch_raft.cnet(xt).permute(0, 2, 3, 1).numpy()
    ours_f = np.asarray(jraft.basic_encoder(jax_params, "fnet", jnp.asarray(x), "instance"))
    ours_c = np.asarray(jraft.basic_encoder(jax_params, "cnet", jnp.asarray(x), "batch"))
    np.testing.assert_allclose(ours_f, ref_f, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(ours_c, ref_c, atol=2e-4, rtol=1e-3)


# With RANDOM weights the RAFT update loop is not contractive: the random
# correlation field (values +-75) shifts by ~0.05 for a 6e-4 coordinate
# perturbation (measured on the torch reference itself), so fp noise is
# amplified ~30x per iteration and multi-iteration bit-parity is not
# meaningful. One iteration still exercises every block (encoders, corr
# pyramid+lookup, motion encoder, GRU, flow/mask heads, convex upsample)
# and must match tightly. Real pretrained weights are contractive.
@pytest.mark.parametrize("iters,atol", [(1, 2e-3)])
def test_raft_forward_parity(torch_raft, jax_params, iters, atol):
    rng = np.random.default_rng(1)
    h, w = 128, 160
    im1 = rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32)
    im2 = np.clip(im1 + rng.normal(0, 0.05, im1.shape), -1, 1).astype(np.float32)

    t1 = torch.from_numpy(im1).permute(0, 3, 1, 2)
    t2 = torch.from_numpy(im2).permute(0, 3, 1, 2)
    with torch.no_grad():
        _, ref_flow = torch_raft(t1, t2, iters=iters, test_mode=True)
    ref_flow = ref_flow.permute(0, 2, 3, 1).numpy()

    ours = np.asarray(
        jraft.raft_forward(jax_params, jnp.asarray(im1), jnp.asarray(im2), iters=iters)
    )
    assert ours.shape == ref_flow.shape
    err = np.abs(ours - ref_flow)
    # bound the bulk of the field; a handful of chaotic pixels may exceed it
    assert np.quantile(err, 0.99) < atol, (
        f"p99.8 err {np.quantile(err, 0.99):.3e} >= {atol}"
    )


def test_raft_bi_matches_two_directions(jax_params):
    """The batched bidirectional forward (shared encoders, transposed
    correlation volume, one 2x-batch scan) must reproduce two independent
    raft_forward calls — the RAFT_bi semantics (flow_comp_raft.py:39-58)."""
    rng = np.random.default_rng(21)
    b, t, h, w = 1, 4, 64, 96
    base = rng.uniform(-1, 1, (b, 1, h, w, 3))
    drift = np.cumsum(rng.normal(0, 0.03, (b, t, h, w, 3)), axis=1)
    frames = np.clip(base + drift, -1, 1).astype(np.float32)
    fj = jnp.asarray(frames)

    ff, fb = jraft.raft_bi_forward(jax_params, fj, iters=2)

    f1 = fj[:, :-1].reshape(b * (t - 1), h, w, 3)
    f2 = fj[:, 1:].reshape(b * (t - 1), h, w, 3)
    ref_f = jraft.raft_forward(jax_params, f1, f2, iters=2)
    ref_b = jraft.raft_forward(jax_params, f2, f1, iters=2)

    for got, ref in ((ff, ref_f), (fb, ref_b)):
        err = np.abs(np.asarray(got).reshape(ref.shape) - np.asarray(ref))
        # random weights make the recurrence mildly chaotic (see above);
        # bound the bulk of the field
        assert np.quantile(err, 0.99) < 1e-3, np.quantile(err, 0.99)


def test_raft_bi_unpadded_einsum_matches_fallback(jax_params):
    """The TPU path (unpadded pyramid + one-hot einsum lookup) vs the
    padded dynamic-slice fallback: out-of-range taps must contribute the
    same exact zeros whether they read a zero border or miss every
    one-hot row."""
    from comfyui_propainter_nodes_tpu.ops import deform_conv as _dc

    rng = np.random.default_rng(22)
    b, t, h, w = 1, 3, 64, 96
    frames = rng.uniform(-1, 1, (b, t, h, w, 3)).astype(np.float32)
    fj = jnp.asarray(frames)

    ref_f, ref_b = jraft.raft_bi_forward(jax_params, fj, iters=1)

    import os

    prev = _dc._USE_PALLAS
    _dc._USE_PALLAS = True  # activates the einsum lookup path on CPU
    os.environ["PROPAINTER_TPU_CORR_KERNEL"] = "einsum"
    try:
        assert jraft._use_unpadded_einsum()
        got_f, got_b = jraft.raft_bi_forward(jax_params, fj, iters=1)
    finally:
        _dc._USE_PALLAS = prev
        del os.environ["PROPAINTER_TPU_CORR_KERNEL"]

    np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref_f), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b), atol=2e-4)


def test_raft_bi_lanes_lookup_matches_fallback(jax_params):
    """The default TPU path (pixels-on-lanes Pallas corr lookup) vs the
    padded dynamic-slice fallback, end-to-end through raft_bi_forward
    (interpret mode on CPU)."""
    from jax.experimental.pallas import tpu as pltpu

    from comfyui_propainter_nodes_tpu.ops import deform_conv as _dc

    rng = np.random.default_rng(22)
    b, t, h, w = 1, 3, 64, 96
    frames = rng.uniform(-1, 1, (b, t, h, w, 3)).astype(np.float32)
    fj = jnp.asarray(frames)

    ref_f, ref_b = jraft.raft_bi_forward(jax_params, fj, iters=1)

    prev = _dc._USE_PALLAS
    _dc._USE_PALLAS = True  # activates the lanes lookup path on CPU
    try:
        with pltpu.force_tpu_interpret_mode():
            got_f, got_b = jraft.raft_bi_forward(jax_params, fj, iters=1)
    finally:
        _dc._USE_PALLAS = prev

    np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref_f), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b), atol=2e-4)


def test_raft_bi_shapes(jax_params):
    rng = np.random.default_rng(2)
    frames = rng.uniform(-1, 1, (1, 4, 128, 160, 3)).astype(np.float32)
    ff, fb = jraft.raft_bi_forward(jax_params, jnp.asarray(frames), iters=2)
    assert ff.shape == (1, 3, 128, 160, 2)
    assert fb.shape == (1, 3, 128, 160, 2)
    # forward and backward flows must differ (directionality is real)
    assert float(jnp.abs(ff - fb).max()) > 1e-3


def test_raft_scan_matches_unrolled_iterations(torch_raft, jax_params):
    """The 20-iteration lax.scan (production default) must equal running
    the update step sequentially — pins the carry wiring (net, coords,
    up_mask) and that ONLY the final iteration's upsample mask is used.
    (Multi-iteration parity vs torch is not testable with random weights:
    the GRU recurrence is chaotic / NaNs on both sides.)"""
    rng = np.random.default_rng(3)
    im1j = jnp.asarray(rng.uniform(-1, 1, (1, 64, 96, 3)).astype(np.float32))
    im2j = jnp.asarray(rng.uniform(-1, 1, (1, 64, 96, 3)).astype(np.float32))
    iters = 5

    full = jraft.raft_forward(jax_params, im1j, im2j, iters=iters)

    # unrolled reference built from the same building blocks
    p = jax_params
    n, h, w = 1, 64, 96
    both = jnp.concatenate([im1j, im2j], axis=0)
    fmaps = jraft.basic_encoder(p, "fnet", both, norm="instance")
    pyramid = jraft.build_corr_pyramid(fmaps[:n], fmaps[n:])
    cnet = jraft.basic_encoder(p, "cnet", im1j, norm="batch")
    net = jnp.tanh(cnet[..., : jraft.HDIM])
    inp = jax.nn.relu(cnet[..., jraft.HDIM :])
    coords0 = jraft.coords_grid(n, h // 8, w // 8)
    coords1 = coords0
    for _ in range(iters):
        corr = jraft.lookup_corr(pyramid, coords1)
        flow = coords1 - coords0
        net, delta = jraft._update_block(p, net, inp, corr, flow)
        coords1 = coords1 + delta
    ref = jraft.convex_upsample(coords1 - coords0, jraft._upsample_mask(p, net))
    np.testing.assert_allclose(np.asarray(full), np.asarray(ref), atol=1e-5)


def test_raft_forward_parity_20_iters_contractive(torch_raft, jax_params):
    """Full 20-iteration parity vs torch — the production iteration count.

    Random weights make the recurrence chaotic (see above), so the
    flow-head output is damped 100x on BOTH sides: the per-iteration loop
    gain drops below 1 and the 20-step scan must track the torch loop to
    fp32 tolerance. This pins the multi-iteration envelope (carry wiring,
    corr re-lookup each step, final-iter upsample mask) that the 1-iter
    test cannot see."""
    import copy

    damped = copy.deepcopy(torch_raft)
    with torch.no_grad():
        damped.update_block.flow_head.conv2.weight *= 0.01
        damped.update_block.flow_head.conv2.bias *= 0.01
    damped.eval()
    params = {
        k: jnp.asarray(v)
        for k, v in convert_state_dict(damped.state_dict()).items()
    }

    rng = np.random.default_rng(7)
    h, w = 128, 160
    im1 = rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32)
    im2 = np.clip(im1 + rng.normal(0, 0.05, im1.shape), -1, 1).astype(np.float32)

    with torch.no_grad():
        _, ref_flow = damped(
            torch.from_numpy(im1).permute(0, 3, 1, 2),
            torch.from_numpy(im2).permute(0, 3, 1, 2),
            iters=20,
            test_mode=True,
        )
    ref_flow = ref_flow.permute(0, 2, 3, 1).numpy()

    ours = np.asarray(
        jraft.raft_forward(params, jnp.asarray(im1), jnp.asarray(im2), iters=20)
    )
    err = np.abs(ours - ref_flow)
    assert np.quantile(err, 0.99) < 2e-3, f"p99 err {np.quantile(err, 0.99):.3e}"


def test_raft_20iter_per_iteration_parity_fp64(torch_raft, monkeypatch):
    """Per-iteration fidelity of the flagship raft_iter=20 loop at fp64
    (VERDICT r3 task 6): torch double vs jax x64, max-abs-diff of every
    iteration's UPSAMPLED flow bounded over all 20 iterations.

    The flow head is damped 100x on both sides so the recurrence is
    contractive (random weights are chaotic: ~30x fp-noise amplification
    per iteration — see test_raft_scan_matches_unrolled_iterations; real
    pretrained weights are contractive, so this is the faithful regime).
    Measured behavior: the per-iter diff grows LINEARLY at ~1.2e-9/iter
    (accumulating conv-reassociation noise, no chaotic amplification),
    reaching ~2.3e-8 by iter 20 — the envelope asserts that linear
    growth with ~2x headroom, 3+ orders tighter than anything fp32 can
    certify. Oracle: /root/reference/model/modules/RAFT/raft.py:130-147
    (test_mode=False returns the per-iteration flow_predictions)."""
    import copy

    damped = copy.deepcopy(torch_raft).double()
    with torch.no_grad():
        damped.update_block.flow_head.conv2.weight *= 0.01
        damped.update_block.flow_head.conv2.bias *= 0.01
    damped.eval()

    rng = np.random.default_rng(11)
    # >=128x160 keeps the level-3 corr map >=2x2 (at 1x1 the reference's
    # grid normalization divides by W-1=0 -> NaN on both sides)
    h, w = 128, 160
    im1 = rng.uniform(-1, 1, (1, h, w, 3))
    im2 = np.clip(im1 + rng.normal(0, 0.05, im1.shape), -1, 1)

    # the reference hard-casts to fp32 internally (raft.py:109-110
    # fmap.float(), corr.py:49 .float(), utils.py:85 coords .float());
    # for a genuine double-precision oracle those casts must keep double
    # precision for this forward only
    monkeypatch.setattr(torch.Tensor, "float", torch.Tensor.double)
    with torch.no_grad():
        preds = damped(
            torch.from_numpy(im1).permute(0, 3, 1, 2),
            torch.from_numpy(im2).permute(0, 3, 1, 2),
            iters=20,
            test_mode=False,
        )
    monkeypatch.undo()
    ref_iters = [p.permute(0, 2, 3, 1).numpy() for p in preds]
    assert ref_iters[0].dtype == np.float64

    with jax.enable_x64(True):
        p = {
            k: jnp.asarray(np.asarray(v), jnp.float64)
            for k, v in convert_state_dict(damped.state_dict()).items()
        }
        im1j = jnp.asarray(im1, jnp.float64)
        im2j = jnp.asarray(im2, jnp.float64)
        both = jnp.concatenate([im1j, im2j], axis=0)
        fmaps = jraft.basic_encoder(p, "fnet", both, norm="instance")
        pyramid = jraft.build_corr_pyramid(fmaps[:1], fmaps[1:])
        cnet = jraft.basic_encoder(p, "cnet", im1j, norm="batch")
        net = jnp.tanh(cnet[..., : jraft.HDIM])
        inp = jax.nn.relu(cnet[..., jraft.HDIM :])
        from comfyui_propainter_nodes_tpu.ops.warp import coords_grid

        coords0 = coords_grid(1, h // 8, w // 8, dtype=jnp.float64)
        coords1 = coords0
        per_iter_diff = []
        for it in range(20):
            corr = jraft.lookup_corr(pyramid, coords1)
            flow = coords1 - coords0
            net, delta = jraft._update_block(p, net, inp, corr, flow)
            coords1 = coords1 + delta
            flow_up = jraft.convex_upsample(
                coords1 - coords0, jraft._upsample_mask(p, net)
            )
            assert flow_up.dtype == jnp.float64  # x64 actually in effect
            per_iter_diff.append(
                float(np.max(np.abs(np.asarray(flow_up) - ref_iters[it])))
            )

    for it, d in enumerate(per_iter_diff):
        assert d < 2.5e-9 * (it + 1) + 2e-9, (
            f"iter {it}: {d:.3e} breaks the linear fp64 noise envelope; "
            f"full trajectory: {per_iter_diff}"
        )


def test_flow_stage_sequential_chunk_map_matches_batched(monkeypatch, jax_params):
    """Past the correlation-volume footprint gate the flow stage runs its
    RAFT chunks as a sequential lax.map (720p+ streaming would otherwise
    materialize every pair's [HW/64]^2 volume at once — 36.6GB at 240f
    720p). Forcing the gate low must reproduce the batched result."""
    from comfyui_propainter_nodes_tpu.config import PipelineConfig
    from comfyui_propainter_nodes_tpu.pipeline.stages import Pipeline
    from comfyui_propainter_nodes_tpu.utils import weights as wz

    rng = np.random.default_rng(3)
    t, h, w = 16, 64, 96
    frames = jnp.asarray(
        rng.uniform(-1, 1, (1, t, h, w, 3)).astype(np.float32)
    )
    cfg = PipelineConfig(raft_iter=2, fp16="disable", process_size=(w, h))
    params = [
        wz.get_params(m, allow_random=True)
        for m in ("raft", "flow_completion", "inpaint_generator")
    ]
    # force chunking (t=16 > clip=12) AND the batched form (gate high)
    monkeypatch.setenv("PROPAINTER_TPU_RAFT_ALLPAIRS_BYTES", "0.1")
    # gate 0.1 byte: allpairs off AND sequential map on
    seq = Pipeline(*params, cfg).compute_flow(frames)
    monkeypatch.setenv("PROPAINTER_TPU_RAFT_ALLPAIRS_BYTES", "1e18")
    ref = Pipeline(*params, cfg).compute_flow(frames)
    np.testing.assert_allclose(
        np.asarray(seq[0]), np.asarray(ref[0]), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(seq[1]), np.asarray(ref[1]), atol=2e-4, rtol=1e-3
    )


def test_flow_stage_chunk_sequential_map_matches_batched(monkeypatch, jax_params):
    """The middle memory regime: all-chunks batching blows the volume
    budget but ONE chunk's batch fits (BASELINE config 3's 80f stack) —
    the stage maps sequentially over chunks with within-chunk batching
    and must reproduce the fully batched result."""
    from comfyui_propainter_nodes_tpu.config import PipelineConfig
    from comfyui_propainter_nodes_tpu.pipeline.stages import Pipeline
    from comfyui_propainter_nodes_tpu.utils import weights as wz

    rng = np.random.default_rng(4)
    t, h, w = 16, 64, 96
    frames = jnp.asarray(
        rng.uniform(-1, 1, (1, t, h, w, 3)).astype(np.float32)
    )
    cfg = PipelineConfig(raft_iter=2, fp16="disable", process_size=(w, h))
    params = [
        wz.get_params(m, allow_random=True)
        for m in ("raft", "flow_completion", "inpaint_generator")
    ]
    # budget between one chunk's volume (~1.2MB at this size) and the
    # total (~2.4MB): selects the chunk-sequential map
    monkeypatch.setenv("PROPAINTER_TPU_RAFT_ALLPAIRS_BYTES", "2e6")
    seq = Pipeline(*params, cfg).compute_flow(frames)
    monkeypatch.setenv("PROPAINTER_TPU_RAFT_ALLPAIRS_BYTES", "1e18")
    ref = Pipeline(*params, cfg).compute_flow(frames)
    np.testing.assert_allclose(
        np.asarray(seq[0]), np.asarray(ref[0]), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(seq[1]), np.asarray(ref[1]), atol=2e-4, rtol=1e-3
    )

def test_flow_stage_seqdir_pairs_match_batched(monkeypatch, jax_params):
    """The huge-resolution regime (1080p): even one pair's batched-
    direction pyramid build peaks over HBM (transpose + [2N] concat of
    the level-0 volume), so the per-pair map runs the two directions
    sequentially (raft_bi_forward_seqdir). Forcing both gates low must
    reproduce the batched result."""
    from comfyui_propainter_nodes_tpu.config import PipelineConfig
    from comfyui_propainter_nodes_tpu.pipeline.stages import Pipeline
    from comfyui_propainter_nodes_tpu.utils import weights as wz

    rng = np.random.default_rng(5)
    t, h, w = 16, 64, 96
    frames = jnp.asarray(
        rng.uniform(-1, 1, (1, t, h, w, 3)).astype(np.float32)
    )
    cfg = PipelineConfig(raft_iter=2, fp16="disable", process_size=(w, h))
    params = [
        wz.get_params(m, allow_random=True)
        for m in ("raft", "flow_completion", "inpaint_generator")
    ]
    # per-pair map (allpairs + chunk-batch off) + sequential directions
    monkeypatch.setenv("PROPAINTER_TPU_RAFT_ALLPAIRS_BYTES", "0.1")
    monkeypatch.setenv("PROPAINTER_TPU_RAFT_SEQDIR_BYTES", "0.1")
    seq = Pipeline(*params, cfg).compute_flow(frames)
    monkeypatch.delenv("PROPAINTER_TPU_RAFT_SEQDIR_BYTES")
    monkeypatch.setenv("PROPAINTER_TPU_RAFT_ALLPAIRS_BYTES", "1e18")
    ref = Pipeline(*params, cfg).compute_flow(frames)
    np.testing.assert_allclose(
        np.asarray(seq[0]), np.asarray(ref[0]), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(seq[1]), np.asarray(ref[1]), atol=2e-4, rtol=1e-3
    )
