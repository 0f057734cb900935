"""TPU-native ProPainter video inpainting framework.

Drop-in ComfyUI custom-node package (same NODE_CLASS_MAPPINGS contract as
the reference __init__.py:1-3) built on JAX/XLA/Pallas for TPU.
"""

from .nodes import NODE_CLASS_MAPPINGS, NODE_DISPLAY_NAME_MAPPINGS

__all__ = ["NODE_CLASS_MAPPINGS", "NODE_DISPLAY_NAME_MAPPINGS"]
