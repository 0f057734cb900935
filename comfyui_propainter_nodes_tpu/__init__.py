"""TPU-native ProPainter video inpainting framework.

Drop-in ComfyUI custom-node package (same NODE_CLASS_MAPPINGS contract as
the reference __init__.py:1-3) built on JAX/XLA/Pallas for TPU.
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache: pipeline programs are large (scan
# bodies with deformable convs / window attention) and TPU compiles are
# minutes — cache them across processes. Disable with
# PROPAINTER_TPU_COMPILE_CACHE=0 or point it elsewhere.
_cache = _os.environ.get(
    "PROPAINTER_TPU_COMPILE_CACHE",
    _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache"),
)
if _cache != "0":
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs
        pass

from .nodes import NODE_CLASS_MAPPINGS, NODE_DISPLAY_NAME_MAPPINGS

__all__ = ["NODE_CLASS_MAPPINGS", "NODE_DISPLAY_NAME_MAPPINGS"]
