"""Training losses.

The reference ships training-only loss code as dead weight
(flow/edge/ternary losses model/modules/flow_comp_raft.py:62-299, GAN
discriminators model/propainter.py:459-658). Here the reconstruction
losses used to fine-tune the InpaintGenerator are implemented
functionally; adversarial training is out of scope for the inference
framework but the hole/valid split matches ProPainter's recipe.
"""

from __future__ import annotations

import jax.numpy as jnp


def l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def masked_l1(pred, target, mask) -> jnp.ndarray:
    num = jnp.sum(jnp.abs(pred - target) * mask)
    den = jnp.sum(mask) * pred.shape[-1] + 1e-8
    return num / den


def reconstruction_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    hole_weight: float = 1.0,
    valid_weight: float = 1.0,
) -> jnp.ndarray:
    """Hole/valid-weighted L1 on [B, T, H, W, 3] frames in [-1, 1]."""
    hole = masked_l1(pred, target, mask)
    valid = masked_l1(pred, target, 1.0 - mask)
    return hole_weight * hole + valid_weight * valid
