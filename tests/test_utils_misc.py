"""Small-surface unit tests: config derivations, weights zoo, metrics."""

import json
import os

import numpy as np
import pytest

from comfyui_propainter_nodes_tpu.config import (
    ImageConfig,
    OutpaintConfig,
    PipelineConfig,
)
from comfyui_propainter_nodes_tpu.utils import weights as wz
from comfyui_propainter_nodes_tpu.utils.checkpoint import (
    convert_state_dict,
    load_params,
    save_params,
)


def test_process_size_mod8():
    assert ImageConfig(641, 365).process_size == (640, 360)
    assert ImageConfig(8, 8).process_size == (8, 8)


def test_outpaint_size():
    c = OutpaintConfig(640, 360, 5, 8, 1.2, 1.0)
    assert c.outpaint_size == (768, 360)
    assert c.process_size == (640, 360)


def test_raft_chunk_len_buckets():
    # reference propainter_inference.py:65-72 width buckets
    assert PipelineConfig(process_size=(640, 360)).raft_chunk_len() == 12
    assert PipelineConfig(process_size=(720, 400)).raft_chunk_len() == 8
    assert PipelineConfig(process_size=(1280, 720)).raft_chunk_len() == 4
    assert PipelineConfig(process_size=(1920, 1080)).raft_chunk_len() == 2


def test_config_hashable_and_replace():
    c = PipelineConfig()
    assert hash(c) == hash(PipelineConfig())
    c2 = c.replace(raft_iter=5)
    assert c2.raft_iter == 5 and c.raft_iter == 20


def test_random_params_cover_spec_and_roundtrip(tmp_path):
    params = wz.random_params("raft", seed=1)
    spec = wz.load_spec()["raft"]
    assert set(params) == set(spec)
    for k, v in params.items():
        assert list(v.shape) == spec[k]
    path = str(tmp_path / "p.npz")
    save_params(params, path)
    loaded = load_params(path)
    np.testing.assert_array_equal(
        loaded["fnet.conv1.weight"], params["fnet.conv1.weight"]
    )


def test_convert_state_dict_layouts():
    import torch

    state = {
        "module.conv.weight": torch.zeros(8, 4, 3, 3),   # OIHW -> HWIO
        "lin.weight": torch.zeros(16, 32),                 # (o,i) -> (i,o)
        "c3d.weight": torch.zeros(8, 4, 3, 5, 5),          # OIDHW -> DHWIO
        "bn.num_batches_tracked": torch.zeros(1),          # dropped
        "bn.running_var": torch.ones(8),
    }
    out = convert_state_dict(state)
    assert out["conv.weight"].shape == (3, 3, 4, 8)
    assert out["lin.weight"].shape == (32, 16)
    assert out["c3d.weight"].shape == (3, 5, 5, 4, 8)
    assert "bn.num_batches_tracked" not in out
    assert out["bn.running_var"].shape == (8,)


def test_metrics_record(tmp_path, monkeypatch):
    from comfyui_propainter_nodes_tpu.utils.metrics import RunRecorder, last_run

    path = str(tmp_path / "metrics.jsonl")
    monkeypatch.setenv("PROPAINTER_TPU_METRICS", path)
    with RunRecorder("inpaint", PipelineConfig(), 10):
        pass
    rec = last_run()
    assert rec["ok"] and rec["video_length"] == 10
    line = json.loads(open(path).read().strip())
    assert line["kind"] == "inpaint"


def test_weights_missing_raises(tmp_path, monkeypatch):
    monkeypatch.setenv("PROPAINTER_TPU_WEIGHTS", str(tmp_path))
    wz._PARAM_CACHE.clear()
    with pytest.raises(FileNotFoundError):
        wz.get_params("raft", allow_download=False, allow_random=False)
    wz._PARAM_CACHE.clear()


def test_checksum_verify_and_tamper_detection(tmp_path):
    from comfyui_propainter_nodes_tpu.utils.weights import verify_checksum

    p = tmp_path / "model.pth"
    p.write_bytes(b"weights-v1" * 1000)
    d1 = verify_checksum(str(p))  # trust-on-first-use: records sidecar
    assert (tmp_path / "model.pth.sha256").read_text() == d1
    verify_checksum(str(p))  # unchanged -> ok

    p.write_bytes(b"weights-v2" * 1000)  # tamper
    import pytest

    with pytest.raises(IOError):
        verify_checksum(str(p))


def test_parity_real_weights_exit2_smoke():
    """The real-weights parity gate must be RUNNABLE end-to-end through
    its air-gapped path: with no pretrained checkpoints on disk it exits
    2 ("not run", distinct from gate failure 1) and emits the
    machine-readable not_run JSON (VERDICT r3 task 3c)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # point the weights cache somewhere empty so a developer's local
    # checkpoint download can't flip this test onto the heavy path
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        env["PROPAINTER_TPU_WEIGHTS"] = td
        env["JAX_PLATFORMS"] = "cpu"
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "scripts", "parity_real_weights.py")],
            capture_output=True, text=True, timeout=300, env=env, cwd=repo,
        )
    assert proc.returncode == 2, (proc.stdout, proc.stderr)
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    status = json.loads(lines[-1])
    assert status["status"] == "not_run"
    assert "checkpoints unavailable" in status["reason"]
