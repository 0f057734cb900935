"""Torch-side oracles for parity tests.

We import the *reference* PyTorch model code read-only (it is public
upstream code mounted at /root/reference) purely as a numerics oracle with
random weights — no reference code is copied into this repo.

torchvision is absent in this environment; the reference's propainter /
recurrent_flow_completion modules import it for `ops.deform_conv2d`, so we
register a stub module providing a vectorized torch implementation
(validated against the slow numpy oracle in test_ops_deform_dilate.py).
"""

import sys
import types

import numpy as np
import torch
import torch.nn.functional as F

REFERENCE_ROOT = "/root/reference"


def torch_deform_conv2d(
    x, offset, weight, bias=None, stride=(1, 1), padding=(1, 1), dilation=(1, 1), mask=None
):
    """Vectorized torch implementation of torchvision.ops.deform_conv2d
    (stride 1, dilation 1, zeros padding, modulated)."""
    s = stride if isinstance(stride, (tuple, list)) else (stride, stride)
    assert tuple(s) == (1, 1), "oracle supports stride 1 only"
    n, cin, h, w = x.shape
    cout, _, kh, kw = weight.shape
    k = kh * kw
    g = offset.shape[1] // (2 * k)
    cg = cin // g
    pad = padding[0] if isinstance(padding, (tuple, list)) else padding

    off = offset.view(n, g, k, 2, h, w)
    dy, dx = off[:, :, :, 0], off[:, :, :, 1]  # [n, g, k, h, w]
    gy, gx = torch.meshgrid(
        torch.arange(h, dtype=x.dtype), torch.arange(w, dtype=x.dtype), indexing="ij"
    )
    ky, kx = torch.meshgrid(
        torch.arange(kh, dtype=x.dtype) - pad,
        torch.arange(kw, dtype=x.dtype) - pad,
        indexing="ij",
    )
    sy = gy[None, None, None] + ky.reshape(-1)[None, None, :, None, None] + dy
    sx = gx[None, None, None] + kx.reshape(-1)[None, None, :, None, None] + dx

    xg = x.view(n, g, cg, h * w)

    def tap(iy, ix, wgt):
        valid = ((ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)).to(x.dtype)
        iyc = iy.clamp(0, h - 1).long()
        ixc = ix.clamp(0, w - 1).long()
        idx = (iyc * w + ixc).view(n, g, 1, k * h * w).expand(n, g, cg, k * h * w)
        v = torch.gather(xg, 3, idx).view(n, g, cg, k, h, w)
        return v * (wgt * valid).unsqueeze(2)

    y0 = torch.floor(sy)
    x0 = torch.floor(sx)
    wy1, wx1 = sy - y0, sx - x0
    wy0, wx0 = 1 - wy1, 1 - wx1
    samp = (
        tap(y0, x0, wy0 * wx0)
        + tap(y0, x0 + 1, wy0 * wx1)
        + tap(y0 + 1, x0, wy1 * wx0)
        + tap(y0 + 1, x0 + 1, wy1 * wx1)
    )  # [n, g, cg, k, h, w]
    if mask is not None:
        samp = samp * mask.view(n, g, 1, k, h, w)
    samp = samp.permute(0, 3, 1, 2, 4, 5).reshape(n, k * cin, h, w)
    wmat = weight.permute(2, 3, 1, 0).reshape(k * cin, cout)
    out = torch.einsum("nphw,pc->nchw", samp, wmat)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


def import_reference_module(name: str):
    """Import a module from the reference repo under a synthetic package
    root (bypasses reference/__init__.py, which needs ComfyUI)."""
    install_reference_path()
    pkg_name = "refpkg"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [REFERENCE_ROOT]
        sys.modules[pkg_name] = pkg
    import importlib

    return importlib.import_module(f"{pkg_name}.{name}")


def install_reference_path():
    """Make the reference repo importable (torchvision stubbed)."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_ops = types.ModuleType("torchvision.ops")
        tv_ops.deform_conv2d = torch_deform_conv2d
        tv.ops = tv_ops

        # minimal transforms surface used by the reference's image_utils
        tv_tf = types.ModuleType("torchvision.transforms")

        class _Compose:
            def __init__(self, fns):
                self.fns = fns

            def __call__(self, x):
                for f in self.fns:
                    x = f(x)
                return x

        tv_tf.Compose = _Compose
        tv_tff = types.ModuleType("torchvision.transforms.functional")

        def _to_pil_image(t):
            from PIL import Image

            a = t.detach().cpu().numpy()
            if a.ndim == 3 and a.shape[0] in (1, 3):
                a = np.moveaxis(a, 0, -1)
            if a.ndim == 3 and a.shape[-1] == 1:
                a = a[..., 0]
            if a.dtype != np.uint8:
                a = np.clip(a * 255.0, 0, 255).astype(np.uint8)
            return Image.fromarray(a)

        tv_tff.to_pil_image = _to_pil_image
        tv_tf.functional = tv_tff
        tv.transforms = tv_tf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops
        sys.modules["torchvision.transforms"] = tv_tf
        sys.modules["torchvision.transforms.functional"] = tv_tff
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def seed_torch_model(model: torch.nn.Module, seed: int = 0) -> None:
    """Deterministic random init with fan-in scaling.

    Recurrent reference models are chaotic under unscaled random weights
    (per-step gain ~7x blows up magnitudes and turns fp noise into O(1)
    divergence); fan-in-scaled weights keep the recurrences near unit gain
    like real trained checkpoints, making parity comparisons meaningful.
    """
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in sorted(model.named_parameters()):
            if p.ndim >= 2:
                fan_in = int(np.prod(p.shape[1:]))
                std = 1.0 / np.sqrt(fan_in)
            else:
                std = 0.05
            p.copy_(torch.randn(p.shape, generator=gen) * std)
        for name, b in sorted(model.named_buffers()):
            if b.dtype.is_floating_point:
                if "running_var" in name:
                    b.copy_(torch.rand(b.shape, generator=gen) + 0.5)
                else:
                    b.copy_(torch.randn(b.shape, generator=gen) * 0.1)
