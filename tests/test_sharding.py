"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from comfyui_propainter_nodes_tpu.parallel.mesh import make_mesh
from comfyui_propainter_nodes_tpu.parallel.sharding import param_spec, shard_params
from comfyui_propainter_nodes_tpu.training.train_step import init_state, make_train_step
from comfyui_propainter_nodes_tpu.utils.weights import random_params


def _tiny_batch(b, l_t, n_ref, h, w, seed=0):
    rng = np.random.default_rng(seed)
    t = l_t + n_ref
    return {
        "frames": jnp.asarray(rng.uniform(-1, 1, (b, t, h, w, 3)).astype(np.float32)),
        "masks": jnp.asarray(
            (rng.uniform(size=(b, t, h, w, 1)) > 0.8).astype(np.float32)
        ),
        "flows_f": jnp.zeros((b, l_t - 1, h, w, 2), jnp.float32),
        "flows_b": jnp.zeros((b, l_t - 1, h, w, 2), jnp.float32),
    }


def test_param_spec_rules():
    from jax.sharding import PartitionSpec as P

    assert param_spec("transformers.transformer.0.attention.query.weight") == P(
        None, "model"
    )
    assert param_spec("transformers.transformer.3.attention.proj.weight") == P(
        "model", None
    )
    assert param_spec("transformers.transformer.1.mlp.fc1.0.weight") == P(None, "model")
    assert param_spec("transformers.transformer.1.mlp.fc2.1.weight") == P("model", None)
    assert param_spec("encoder.layers.0.weight") == P()


def test_sharded_step_matches_single_device():
    """dp x tp sharded training step == single-device step (SURVEY §4)."""
    assert len(jax.devices()) >= 8
    params = random_params("inpaint_generator")
    b, l_t, n_ref, h, w = 2, 2, 1, 32, 40
    batch = _tiny_batch(b, l_t, n_ref, h, w)

    mesh8 = make_mesh(8)  # (2, 4): dp=2, tp=4
    state8 = init_state(params, mesh8)
    step8 = make_train_step(mesh8, num_local_frames=l_t)
    state8, loss8 = step8(state8, batch)

    mesh1 = make_mesh(1)
    state1 = init_state(params, mesh1)
    step1 = make_train_step(mesh1, num_local_frames=l_t)
    state1, loss1 = step1(state1, batch)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=2e-5)
    # spot-check an updated sharded parameter matches the replicated run
    key = "transformers.transformer.0.attention.query.weight"
    np.testing.assert_allclose(
        np.asarray(state8.params[key]), np.asarray(state1.params[key]),
        atol=1e-5, rtol=1e-4,
    )


def test_shard_params_placement():
    mesh = make_mesh(8)
    params = {
        "transformers.transformer.0.attention.query.weight": np.zeros(
            (512, 512), np.float32
        ),
        "encoder.layers.0.weight": np.zeros((3, 3, 5, 64), np.float32),
    }
    sharded = shard_params(params, mesh)
    q = sharded["transformers.transformer.0.attention.query.weight"]
    # column-parallel: each model shard holds 512/4 columns
    shard_shapes = {s.data.shape for s in q.addressable_shards}
    assert shard_shapes == {(512, 128)}
    e = sharded["encoder.layers.0.weight"]
    assert {s.data.shape for s in e.addressable_shards} == {(3, 3, 5, 64)}


def test_sharded_window_inference_matches_unsharded():
    """Window batches sharded over the mesh data axis give identical
    pipeline output (inference dp, SURVEY §2.4)."""
    import os

    os.environ["PROPAINTER_TPU_WINDOW_BATCH"] = "4"
    from comfyui_propainter_nodes_tpu.config import PipelineConfig
    from comfyui_propainter_nodes_tpu.pipeline.stages import Pipeline
    from comfyui_propainter_nodes_tpu.utils import weights as wz

    t, h, w = 16, 48, 64
    rng = np.random.default_rng(0)
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
    base = Pipeline(*params, cfg).process(frames, masks, masks, orig)

    mesh = make_mesh(4, model_parallel=1)  # dp=4 over window batches
    sharded = Pipeline(*params, cfg, mesh=mesh).process(frames, masks, masks, orig)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(sharded))


def test_clip_parallel_chunked_pipeline_matches_unsharded():
    """Stages 1-3 chunk loops batched + shard_map'd over the mesh data
    axis (SURVEY §2.4a) must give the identical video."""
    import os

    os.environ["PROPAINTER_TPU_WINDOW_BATCH"] = "4"
    from comfyui_propainter_nodes_tpu.config import PipelineConfig
    from comfyui_propainter_nodes_tpu.pipeline.stages import Pipeline
    from comfyui_propainter_nodes_tpu.utils import weights as wz

    t, h, w = 16, 48, 64
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.uniform(-1, 1, (1, t, h, w, 3)).astype(np.float32))
    masks = jnp.zeros((1, t, h, w, 1)).at[:, :, 16:32, 20:44].set(1.0)
    orig = jnp.asarray(rng.uniform(0, 255, (t, h, w, 3)).astype(np.float32))

    # subvideo_length=6 forces flow-completion AND image-prop chunking;
    # RAFT chunks too (t=16 > clip=12)
    cfg = PipelineConfig(
        ref_stride=4, neighbor_length=4, subvideo_length=6, raft_iter=1,
        fp16="disable", process_size=(w, h),
    )
    params = [
        wz.get_params(m, allow_random=True)
        for m in ("raft", "flow_completion", "inpaint_generator")
    ]
    base = Pipeline(*params, cfg).process(frames, masks, masks, orig)

    mesh = make_mesh(4, model_parallel=1)
    pipe = Pipeline(*params, cfg, mesh=mesh)
    assert pipe._clip_parallel()
    sharded = pipe.process(frames, masks, masks, orig)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(sharded))


def test_sequence_parallel_transformer_matches_unsharded():
    """T-sharded transformer (all-gather KV, SURVEY §2.4b) == single
    device, including occupied windows, temporal dilation, and a padded
    (invalid) frame."""
    from comfyui_propainter_nodes_tpu.ops.attention import transformer_stack
    from comfyui_propainter_nodes_tpu.parallel.sequence import (
        sequence_parallel_transformer,
    )
    from comfyui_propainter_nodes_tpu.utils.weights import random_params

    rng = np.random.default_rng(7)
    b, t, fh, fw, c = 1, 8, 10, 18, 512
    l_t, h4, w4 = 4, 28, 52  # fold_size consistent with the token grid:
    # fh = (h4 + 2*3 - 7)//3 + 1 = 10, fw = (w4 + 2*3 - 7)//3 + 1 = 18
    full = random_params("inpaint_generator")
    p = {
        k: jnp.asarray(v)
        for k, v in full.items()
        if k.startswith("transformers.")
    }
    tokens = jnp.asarray(
        rng.standard_normal((b, t, fh, fw, c)).astype(np.float32) * 0.1
    )
    mask = jnp.zeros((b, l_t, fh, fw, 1)).at[:, :, 2:5, 3:10].set(1.0)
    tv = jnp.asarray([True] * 7 + [False])  # last frame is padding

    ref = transformer_stack(
        p, "transformers", tokens, (h4, w4), mask, t_valid_mask=tv
    )
    mesh = make_mesh(4, model_parallel=4)  # 4-way T shards
    out = sequence_parallel_transformer(
        p, "transformers", tokens, (h4, w4), mask, mesh, t_valid_mask=tv
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


def test_sequence_parallel_pipeline_matches_unsharded(monkeypatch):
    """PRODUCT sequence parallelism (SURVEY §2.4b): the full pipeline
    with the mp>1 window forward routed through the T-sharded
    transformer (stages.py _seq_selected -> parallel/sequence.py) must
    reproduce the single-device video. T_sel=7 here does not divide the
    4-way model axis — exercises the auto-pad + key-mask path."""
    import os

    monkeypatch.setenv("PROPAINTER_TPU_WINDOW_BATCH", "4")
    monkeypatch.setenv("PROPAINTER_TPU_SEQ", "1")
    from comfyui_propainter_nodes_tpu.config import PipelineConfig
    from comfyui_propainter_nodes_tpu.pipeline.stages import Pipeline
    from comfyui_propainter_nodes_tpu.utils import weights as wz

    t, h, w = 16, 48, 64
    rng = np.random.default_rng(2)
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
    monkeypatch.delenv("PROPAINTER_TPU_SEQ", raising=False)
    base = Pipeline(*params, cfg).process(frames, masks, masks, orig)

    monkeypatch.setenv("PROPAINTER_TPU_SEQ", "1")
    mesh = make_mesh(8, model_parallel=4)  # 2 data x 4 model (T shards)
    pipe = Pipeline(*params, cfg, mesh=mesh)
    assert pipe._seq_selected(h)
    sharded = pipe.process(frames, masks, masks, orig)
    # the gathered-KV attention reduces in a different association order
    # than the single-device kernel; a uint8 floor can flip on isolated
    # pixels (same tolerance rationale as __graft_entry__'s mp leg)
    d = np.abs(np.asarray(base) - np.asarray(sharded))
    assert d.max() <= 1 and (d > 0).mean() < 1e-4, (
        f"max diff {d.max()}, frac>0 {(d > 0).mean():.2e}"
    )


def test_crop_decode_matches_uncropped_under_mesh(monkeypatch):
    """Crop-aware decode (decoder_crop tail) under BOTH mesh legs —
    4-way clip-parallel and 2x2 H-sharded — must equal the single-device
    full-frame video on the crop window (VERDICT r4 weak #5: the 1080p
    sharded leg is exactly where the full-res tail is biggest)."""
    monkeypatch.setenv("PROPAINTER_TPU_WINDOW_BATCH", "4")
    from comfyui_propainter_nodes_tpu.config import PipelineConfig
    from comfyui_propainter_nodes_tpu.pipeline.stages import Pipeline
    from comfyui_propainter_nodes_tpu.utils import weights as wz

    t, h, w = 8, 48, 64
    rng = np.random.default_rng(5)
    frames = jnp.asarray(rng.uniform(-1, 1, (1, t, h, w, 3)).astype(np.float32))
    masks = jnp.zeros((1, t, h, w, 1)).at[:, :, 16:28, 24:48].set(1.0)
    orig = jnp.asarray(rng.uniform(0, 255, (t, h, w, 3)).astype(np.float32))

    cfg = PipelineConfig(
        ref_stride=4, neighbor_length=4, subvideo_length=80, raft_iter=1,
        fp16="disable", process_size=(w, h),
    )
    params = [
        wz.get_params(m, allow_random=True)
        for m in ("raft", "flow_completion", "inpaint_generator")
    ]
    base = Pipeline(*params, cfg).process(frames, masks, masks, orig)

    y0, x0, ch, cw = 8, 16, 16, 32  # multiples of 8; halo fits the frame
    y0j, x0j = jnp.asarray(y0), jnp.asarray(x0)
    base_crop = np.asarray(base)[:, y0 : y0 + ch, x0 : x0 + cw]

    for mp in (1, 2):
        mesh = make_mesh(4, model_parallel=mp)
        pipe = Pipeline(*params, cfg, mesh=mesh)
        out = jax.jit(pipe._process_fn(t, (h, w), (ch, cw)))(
            params[0], params[1], params[2], frames, masks, masks, orig,
            y0j, x0j,
        )
        d = np.abs(np.asarray(out) - base_crop)
        assert d.max() <= 1 and (d > 0).mean() < 1e-3, (
            f"mp={mp}: max diff {d.max()}, frac>0 {(d > 0).mean():.2e}"
        )
