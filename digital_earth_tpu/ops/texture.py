"""Equirectangular texture sampling as HBM gathers.

TPUs have no texture units; the reference's GPU sampler calls
(``sampler.sample_lod(fract(uv*scale), 0)``, lib/math_utils.py:39-44) become
bilinear gathers against arrays resident in HBM. Longitude (u) wraps,
latitude (v) clamps — matching a repeat-sampler on an equirect map.

Layout convention: textures are (H, W) or (H, W, C) arrays with row 0 at the
NORTH pole (standard image orientation); ``v`` from ``sphere_uv_map`` is 0 at
the south pole, so rows are addressed with (1 - v).
"""

from __future__ import annotations

import jax.numpy as jnp

from .math_utils import fract, normalize, sphere_uv_map


def _gather2d(tex, iy, ix):
    """Gather texels; tex (H, W[, C]) any dtype -> float32 in [0, 1] for uint8."""
    vals = tex[iy, ix]
    if tex.dtype == jnp.uint8:
        vals = vals.astype(jnp.float32) * (1.0 / 255.0)
    return vals


def sample_equirect(tex, u, v):
    """Bilinear sample at (u, v) in [0,1]^2; u wraps, v clamps.

    Texel centers at (i + 0.5)/N, the standard GPU convention the reference's
    Vulkan sampler uses.
    """
    h, w = tex.shape[0], tex.shape[1]
    x = u * w - 0.5
    y = jnp.clip((1.0 - v) * h - 0.5, 0.0, h - 1.0)  # clamp-to-edge at poles
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    tx = x - x0f
    ty = y - y0f
    x0 = jnp.mod(x0f.astype(jnp.int32), w)
    x1 = jnp.mod(x0 + 1, w)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)

    if tex.ndim == 3:
        tx = tx[..., None]
        ty = ty[..., None]
    v00 = _gather2d(tex, y0, x0)
    v10 = _gather2d(tex, y0, x1)
    v01 = _gather2d(tex, y1, x0)
    v11 = _gather2d(tex, y1, x1)
    top = v00 * (1.0 - tx) + v10 * tx
    bot = v01 * (1.0 - tx) + v11 * tx
    return top * (1.0 - ty) + bot * ty


def sample_sphere_texture(tex, pos, scale=1.0):
    """Sample an equirect texture at the direction of ``pos``
    (reference lib/math_utils.py:39-44)."""
    u, v = sphere_uv_map(normalize(pos))
    if scale != 1.0:
        u = fract(u * scale)
        v = fract(v * scale)
    return sample_equirect(tex, u, v)


def sample_dir_texture(tex, direction):
    """Sample an equirect texture by unit direction (stars background)."""
    u, v = sphere_uv_map(direction)
    return sample_equirect(tex, u, v)
