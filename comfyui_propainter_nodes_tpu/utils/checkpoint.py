"""Torch-checkpoint -> JAX-pytree conversion and on-disk caching.

The reference downloads three `.pth` checkpoints and loads them with
`load_state_dict(strict=True)` (utils/model_utils.py:20-46,
model/modules/flow_comp_raft.py:17-19). Here we convert once into a flat
{name: ndarray} pytree with TPU-friendly layouts:

  conv2d   weight  OIHW   -> HWIO
  conv3d   weight  OIDHW  -> DHWIO
  linear   weight  (o, i) -> (i, o)
  everything else kept as-is

Names keep the torch state-dict spelling (minus the DataParallel
"module." prefix RAFT checkpoints carry) so model code and the parity
harness can cross-reference the reference layer-for-layer.
"""

from __future__ import annotations

import os
from typing import Mapping

import numpy as np

# state-dict keys that are 2D but NOT linear layers (none in these models),
# and keys to drop entirely.
_DROP_SUFFIXES = ("num_batches_tracked",)


def convert_state_dict(state: Mapping[str, "np.ndarray"]) -> dict[str, np.ndarray]:
    """Convert a torch state_dict (tensors or ndarrays) to the JAX layout."""
    out: dict[str, np.ndarray] = {}
    for key, val in state.items():
        if key.startswith("module."):
            key = key[len("module.") :]
        if key.endswith(_DROP_SUFFIXES):
            continue
        arr = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
        if key.endswith(".weight"):
            if arr.ndim == 4:  # conv2d OIHW -> HWIO
                arr = arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 5:  # conv3d OIDHW -> DHWIO
                arr = arr.transpose(2, 3, 4, 1, 0)
            elif arr.ndim == 2:  # linear (out, in) -> (in, out)
                arr = arr.transpose(1, 0)
        out[key] = np.ascontiguousarray(arr)
    return out


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Load a .pth file (CPU) and convert. Requires torch at call time only."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return convert_state_dict(state)


def save_params(params: Mapping[str, np.ndarray], path: str) -> None:
    np.savez(path, **params)


def load_params(path: str) -> dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def convert_or_load_cached(pth_path: str, cache_dir: str) -> dict[str, np.ndarray]:
    """One-time .pth -> .npz conversion with a cache next to the weights."""
    os.makedirs(cache_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(pth_path))[0]
    npz = os.path.join(cache_dir, base + ".jax.npz")
    if os.path.exists(npz):
        return load_params(npz)
    params = load_torch_checkpoint(pth_path)
    save_params(params, npz)
    return params


def filter_prefix(params: Mapping[str, np.ndarray], prefix: str) -> dict[str, np.ndarray]:
    """Sub-tree view: {k[len(prefix):]: v for keys starting with prefix}."""
    return {k[len(prefix) :]: v for k, v in params.items() if k.startswith(prefix)}
