"""Model zoo: checkpoint acquisition, conversion cache, random init.

Replaces the reference's download/lifecycle layer (utils/model_utils.py,
utils/download_utils.py):

  * checkpoints come from the same upstream release URLs; downloads are
    checksum-friendly (size check), retried, and cached under
    <package>/weights/ like the reference (download_utils.py:14-27);
  * .pth files convert once to .npz pytrees (utils/checkpoint.py) and are
    loaded torch-free afterwards;
  * converted params are cached in-process keyed by model name — the
    reference reloads all three models on every node invocation
    (propainter_nodes.py:133), which we deliberately fix;
  * `random_params` builds fan-in-scaled random weights from the committed
    shape spec (param_specs.json) for benchmarks/tests in air-gapped
    environments (no torch, no network needed).
"""

from __future__ import annotations

import hashlib
import json
import os
import urllib.request

import numpy as np

PRETRAIN_MODEL_URL = "https://github.com/sczhou/ProPainter/releases/download/v0.1.0/"

MODEL_FILES = {
    "raft": "raft-things.pth",
    "flow_completion": "recurrent_flow_completion.pth",
    "inpaint_generator": "ProPainter.pth",
}

# Pinned digests of the upstream release artifacts. The build environment
# is air-gapped (the canonical release bytes cannot be observed here), so
# the table ships empty and pins live in `known_sha256.json` next to this
# module: the FIRST connected environment that downloads and validates the
# checkpoints writes it via `scripts/parity_real_weights.py --write-pins`
# (which also proves the weights are real by running the reference-parity
# gate). Until a pin exists, trust-on-first-use applies: the first
# verified download records its digest in a `<file>.sha256` sidecar and
# every later load checks against it.
KNOWN_SHA256: dict[str, str] = {}

_PINS_PATH = os.path.join(os.path.dirname(__file__), "known_sha256.json")
if os.path.exists(_PINS_PATH):
    with open(_PINS_PATH) as _f:
        KNOWN_SHA256.update(json.load(_f))


def write_pins(digests: dict[str, str]) -> str:
    """Persist observed checkpoint digests as the pinned table."""
    merged = dict(KNOWN_SHA256)
    merged.update(digests)
    with open(_PINS_PATH, "w") as f:
        json.dump(merged, f, indent=2, sort_keys=True)
        f.write("\n")
    KNOWN_SHA256.update(merged)
    return _PINS_PATH


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(1 << 20), b""):
            h.update(block)
    return h.hexdigest()


def verify_checksum(path: str) -> str:
    """Verify `path` against the pinned table or its sidecar; record the
    digest on first sight. Returns the digest. Raises IOError on
    mismatch (corrupt or tampered download)."""
    digest = _sha256(path)
    expected = KNOWN_SHA256.get(os.path.basename(path))
    sidecar = path + ".sha256"
    if expected is None and os.path.exists(sidecar):
        with open(sidecar) as f:
            expected = f.read().strip()
    if expected is not None:
        if digest != expected:
            raise IOError(
                f"checksum mismatch for {path}: got {digest}, "
                f"expected {expected}"
            )
    else:
        with open(sidecar, "w") as f:
            f.write(digest)
    return digest

_SPEC_PATH = os.path.join(os.path.dirname(__file__), "param_specs.json")
_PARAM_CACHE: dict[str, dict[str, np.ndarray]] = {}


def weights_dir() -> str:
    d = os.environ.get(
        "PROPAINTER_TPU_WEIGHTS",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "weights"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def download_model(url: str, dest: str, retries: int = 3) -> None:
    last_err = None
    for _ in range(retries):
        try:
            tmp = dest + ".part"
            urllib.request.urlretrieve(url, tmp)
            if os.path.getsize(tmp) < 1 << 20:
                raise IOError(f"suspiciously small download: {url}")
            expected = KNOWN_SHA256.get(os.path.basename(dest))
            if expected is not None and _sha256(tmp) != expected:
                raise IOError(f"checksum mismatch for {url}")
            os.replace(tmp, dest)
            verify_checksum(dest)
            return
        except Exception as e:  # noqa: BLE001 - retry any transport error
            last_err = e
    raise RuntimeError(f"failed to download {url}: {last_err}")


def load_spec() -> dict[str, dict[str, list[int]]]:
    with open(_SPEC_PATH) as f:
        return json.load(f)


def random_params(model: str, seed: int = 0) -> dict[str, np.ndarray]:
    """Fan-in-scaled random params matching the converted layouts."""
    spec = load_spec()[model]
    rng = np.random.default_rng(seed)
    out = {}
    for key, shape in spec.items():
        shape = tuple(shape)
        if key.endswith(".running_var"):
            arr = rng.uniform(0.5, 1.5, shape)
        elif key.endswith((".running_mean",)):
            arr = rng.normal(0, 0.1, shape)
        elif len(shape) >= 2:
            # converted layouts put fan-out last (HWIO / DHWIO / (in, out))
            fan_in = int(np.prod(shape[:-1]))
            arr = rng.normal(0, 1.0 / np.sqrt(fan_in), shape)
        else:
            arr = rng.normal(0, 0.05, shape)
        out[key] = arr.astype(np.float32)
    return out


def get_params(
    model: str,
    allow_download: bool = True,
    allow_random: bool = False,
    seed: int = 0,
) -> dict[str, np.ndarray]:
    """Converted params for `model` ('raft' | 'flow_completion' |
    'inpaint_generator'), with in-process caching."""
    if model in _PARAM_CACHE:
        return _PARAM_CACHE[model]
    from .checkpoint import load_params, load_torch_checkpoint, save_params

    d = weights_dir()
    fname = MODEL_FILES[model]
    npz = os.path.join(d, os.path.splitext(fname)[0] + ".jax.npz")
    pth = os.path.join(d, fname)

    if os.path.exists(npz):
        params = load_params(npz)
    elif os.path.exists(pth):
        verify_checksum(pth)
        params = load_torch_checkpoint(pth)
        save_params(params, npz)
    elif allow_download:
        try:
            download_model(PRETRAIN_MODEL_URL + fname, pth)
        except Exception as e:  # air-gapped fallback
            if allow_random:
                params = random_params(model, seed)
                _PARAM_CACHE[model] = params
                return params
            raise RuntimeError(
                f"cannot obtain weights for {model}: {e}. Place {fname} or "
                f"{os.path.basename(npz)} in {d} (or set "
                f"PROPAINTER_TPU_WEIGHTS), or pass allow_random=True."
            ) from e
        params = load_torch_checkpoint(pth)
        save_params(params, npz)
    elif allow_random:
        params = random_params(model, seed)
    else:
        raise FileNotFoundError(f"no weights for {model} in {d}")

    _PARAM_CACHE[model] = params
    return params
