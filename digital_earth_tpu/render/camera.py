"""Pinhole camera ray generation (reference renderer.py:269-279)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as C
from ..ops.math_utils import cross, normalize


class CameraParams(NamedTuple):
    """Traced camera state (reference renderer.py:27-41,49-52)."""

    position: jnp.ndarray  # (3,)
    look_at: jnp.ndarray  # (3,)
    up: jnp.ndarray  # (3,) normalized
    fov: jnp.ndarray  # vertical half-spread, radians
    aspect_scale: jnp.ndarray


def make_camera_params(
    position, look_at, up=(0.0, 1.0, 0.0), fov=C.DEFAULT_FOV, aspect_scale=1.0
) -> CameraParams:
    up = jnp.asarray(up, dtype=jnp.float32)
    return CameraParams(
        position=jnp.asarray(position, dtype=jnp.float32),
        look_at=jnp.asarray(look_at, dtype=jnp.float32),
        up=up / jnp.linalg.norm(up),
        fov=jnp.asarray(fov, dtype=jnp.float32),
        aspect_scale=jnp.asarray(aspect_scale, dtype=jnp.float32),
    )


def cast_dirs(cam: CameraParams, u, v, u_jitter, v_jitter, image_res):
    """Jittered pinhole directions for pixel coords (u, v); u in [0, W),
    v in [0, H). Matches reference get_cast_dir (renderer.py:269-279),
    including the 1e-5 offsets and the height-normalized film plane.
    """
    w, h = image_res
    aspect_ratio = w / h
    d = normalize(cam.look_at - cam.position)
    fu = (
        2.0 * cam.fov * (u + u_jitter) / h - cam.fov * aspect_ratio - 1e-5
    ) * cam.aspect_scale
    fv = 2.0 * cam.fov * (v + v_jitter) / h - cam.fov - 1e-5
    du = normalize(cross(d, cam.up))
    dv = normalize(cross(du, d))
    return normalize(d + fu[..., None] * du + fv[..., None] * dv)


def generate_rays(key, cam: CameraParams, pixel_u, pixel_v, image_res):
    """Rays for a batch of pixel indices. Returns (pos (N,3), dir (N,3))."""
    n = pixel_u.shape[0]
    ku, kv = jax.random.split(key)
    u_jitter = jax.random.uniform(ku, (n,))
    v_jitter = jax.random.uniform(kv, (n,))
    dirs = cast_dirs(cam, pixel_u, pixel_v, u_jitter, v_jitter, image_res)
    pos = jnp.broadcast_to(cam.position, (n, 3))
    return pos, dirs
