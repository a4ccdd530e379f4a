"""Direction sampling, rebuilt batched + key-based.

The reference (lib/sampling.py) draws from Taichi's implicit per-thread RNG;
here every sampler takes explicit uniform variates (or a key), making renders
deterministic and replayable — a capability upgrade noted in SURVEY.md §2.4.

Each ``sample_*`` comes in two forms:
- ``sample_x(u…)``: pure function of uniform variates, used inside the tracer
  (variates are drawn once per wavefront step from a counter-derived key);
- thin ``sample_x_key(key, …)`` wrappers for tests.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .math_utils import make_orthonormal_basis, normalize, spherical_direction


def sample_cone(u0, u1, cos_theta_max):
    """Uniform direction in a +z cone (reference lib/sampling.py:14-23)."""
    cos_theta = (1.0 - u0) + u0 * cos_theta_max
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = 2.0 * math.pi * u1
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def sample_cone_oriented(u0, u1, cos_theta_max, n):
    """Uniform direction in a cone about axis ``n``
    (reference lib/sampling.py:26-28)."""
    local = sample_cone(u0, u1, cos_theta_max)
    x, y = make_orthonormal_basis(n)
    # reference builds mat3(x, y, n)^T @ v == v.x*x + v.y*y + v.z*n
    return local[..., 0:1] * x + local[..., 1:2] * y + local[..., 2:3] * n


def sample_hemisphere_cosine_weighted(u0, u1, n):
    """Cosine-weighted hemisphere about ``n`` via Shirley's offset-sphere trick
    (reference lib/sampling.py:31-39)."""
    a = 1.0 - 2.0 * u0
    b = jnp.sqrt(jnp.maximum(1.0 - a * a, 0.0))
    a = a * (1.0 - 1e-5)
    b = b * (1.0 - 1e-5)  # grazing-angle precision fix, as in reference
    phi = 2.0 * math.pi * u1
    v = jnp.stack(
        [
            n[..., 0] + b * jnp.cos(phi),
            n[..., 1] + b * jnp.sin(phi),
            n[..., 2] + a,
        ],
        axis=-1,
    )
    return normalize(v)


def sample_sphere(u0, u1):
    """Uniform direction on the sphere (reference lib/sampling.py:42-45)."""
    ang = u0 * 2.0 * math.pi
    y = u1 * 2.0 - 1.0
    ground = jnp.sqrt(jnp.maximum(1.0 - y * y, 0.0))
    return normalize(
        jnp.stack([jnp.sin(ang) * ground, jnp.cos(ang) * ground, y], axis=-1)
    )


# --- key-based convenience wrappers (tests / one-off draws) -----------------


def _u2(key, shape):
    k0, k1 = jax.random.split(key)
    return jax.random.uniform(k0, shape), jax.random.uniform(k1, shape)


def sample_cone_key(key, cos_theta_max, shape=()):
    u0, u1 = _u2(key, shape)
    return sample_cone(u0, u1, cos_theta_max)


def sample_cone_oriented_key(key, cos_theta_max, n):
    u0, u1 = _u2(key, n.shape[:-1])
    return sample_cone_oriented(u0, u1, cos_theta_max, n)


def sample_hemisphere_cosine_weighted_key(key, n):
    u0, u1 = _u2(key, n.shape[:-1])
    return sample_hemisphere_cosine_weighted(u0, u1, n)


def sample_sphere_key(key, shape=()):
    u0, u1 = _u2(key, shape)
    return sample_sphere(u0, u1)


__all__ = [
    "sample_cone",
    "sample_cone_oriented",
    "sample_hemisphere_cosine_weighted",
    "sample_sphere",
    "sample_cone_key",
    "sample_cone_oriented_key",
    "sample_hemisphere_cosine_weighted_key",
    "sample_sphere_key",
    "spherical_direction",
]
