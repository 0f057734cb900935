"""Microbench: corr window lookup variants on the real TPU.

Production geometry for the 640x360 bench config: 12 flow pairs/chunk,
1/8-res grid 45x80 -> M = 43200 pixel maps.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from comfyui_propainter_nodes_tpu.ops.pallas.corr_lookup import (
    corr_window_lookup4_pallas,
)

M = int(os.environ.get("M", 12 * 45 * 80))
DIMS = [(63, 98), (40, 58), (29, 38), (23, 28)]  # padded level maps @640x360
REPS = int(os.environ.get("REPS", 20))

rng = np.random.default_rng(0)
pyr = [jnp.asarray(rng.standard_normal((M, hp, wp)).astype(np.float32)) for hp, wp in DIMS]
sy = jnp.asarray(np.stack([rng.integers(0, hp - 10, M) for hp, _ in DIMS]).astype(np.int32))
sx = jnp.asarray(np.stack([rng.integers(0, wp - 10, M) for _, wp in DIMS]).astype(np.int32))
fy = jnp.asarray(rng.uniform(0, 1, (4, M)).astype(np.float32))
fx = jnp.asarray(rng.uniform(0, 1, (4, M)).astype(np.float32))


def lookup_einsum(pyr, sy, sx, fy, fx, precision="highest"):
    """Row/col one-hot bilinear contraction — no gather, MXU only."""
    outs = []
    for i, c in enumerate(pyr):
        m, hp, wp = c.shape
        syi, sxi = sy[i], sx[i]
        fyi, fxi = fy[i], fx[i]
        iy = jnp.arange(hp, dtype=jnp.int32)
        rw = jnp.where(
            iy[None, None, :] == (syi[:, None, None] + jnp.arange(9, dtype=jnp.int32)[None, :, None]),
            (1.0 - fyi)[:, None, None],
            0.0,
        ) + jnp.where(
            iy[None, None, :] == (syi[:, None, None] + 1 + jnp.arange(9, dtype=jnp.int32)[None, :, None]),
            fyi[:, None, None],
            0.0,
        )  # [M, 9, Hp]
        ix = jnp.arange(wp, dtype=jnp.int32)
        cw = jnp.where(
            ix[None, None, :] == (sxi[:, None, None] + jnp.arange(9, dtype=jnp.int32)[None, :, None]),
            (1.0 - fxi)[:, None, None],
            0.0,
        ) + jnp.where(
            ix[None, None, :] == (sxi[:, None, None] + 1 + jnp.arange(9, dtype=jnp.int32)[None, :, None]),
            fxi[:, None, None],
            0.0,
        )  # [M, 9, Wp]
        tmp = jnp.einsum("piy,pyx->pix", rw, c, precision=precision)
        outs.append(jnp.einsum("pix,pjx->pij", tmp, cw, precision=precision))
    return jnp.stack(outs, 1)


def timeit(name, lookup):
    """Scan REPS lookups inside ONE jit (device-time measurement; per-call
    dispatch through the tunnel would otherwise dominate). The scan carry
    perturbs sy so iterations can't be CSE'd."""

    @jax.jit
    def run(pyr, sy, sx, fy, fx):
        def step(carry, _):
            syc = jnp.minimum(sy + carry, sy)  # == sy (carry >= 0), opaque to CSE
            out = lookup(pyr, syc, sx, fy, fx)
            return jnp.int32(jnp.sum(out[0, 0, 0, 0]) > 1e30), jnp.sum(out)
        _, sums = jax.lax.scan(step, jnp.int32(0), None, length=REPS)
        return sums

    s = float(jnp.sum(run(pyr, sy, sx, fy, fx)))  # compile
    t0 = time.perf_counter()
    s = float(jnp.sum(run(pyr, sy, sx, fy, fx)))
    dt = (time.perf_counter() - t0 - 0.031) / REPS
    print(f"{name}: {dt*1e3:.2f} ms/call (device, scanned)  sum={s:.1f}")


out_p = jax.jit(corr_window_lookup4_pallas)(pyr, sy, sx, fy, fx)
out_e = jax.jit(lookup_einsum)(pyr, sy, sx, fy, fx)
out_d = jax.jit(lambda *a: lookup_einsum(*a, precision="default"))(pyr, sy, sx, fy, fx)
err_e = float(jnp.max(jnp.abs(out_p - out_e)))
err_d = float(jnp.max(jnp.abs(out_p - out_d)))
print(f"einsum-highest vs pallas max err: {err_e:.3e}")
print(f"einsum-default vs pallas max err: {err_d:.3e}")

timeit("pallas-block", corr_window_lookup4_pallas)
timeit("einsum-highest", lookup_einsum)
timeit("einsum-default", lambda *a: lookup_einsum(*a, precision="default"))
