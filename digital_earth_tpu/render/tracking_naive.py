"""Reference-style trackers: direct wavefront transliterations of the
reference's per-thread loops (one step per iteration, global majorants, plain
sphere tracing). Selected with ``TraceConfig(naive_tracking=True)``.

These exist (a) as the ground truth the accelerated trackers in
render/pathtracer.py are validated against (see tests/test_tracking_equiv.py)
and (b) as the reference-faithful execution mode. Citations:

- intersect_land_naive    <- reference pathtracer.py:27-46
- delta_track_naive       <- reference pathtracer.py:77-115
- ratio_track_naive       <- reference pathtracer.py:117-143
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as C
from ..models import volume as vol
from ..ops import math_utils as mu
from ..ops import rng

NULL_EVENT = 0
ABSORB_EVENT = 1
SCATTER_EVENT = 2

_ALBEDOS = jnp.asarray(C.SCATTERING_ALBEDOS)


def intersect_land_naive(topo, pos, direction, scale, active, cfg):
    """Plain sphere march: RSI warm start on the atmosphere shell, <=250
    steps of the (possibly negative) SDF, relative epsilon, hit if the cap
    distance was not exceeded (reference pathtracer.py:27-46)."""
    from .pathtracer import land_sdf  # shared SDF

    n = pos.shape[0]
    if not cfg.enable_land:
        return jnp.full((n,), -1.0)
    a_near, _ = mu.rsi(pos, direction, C.ATMOS_UPPER_LIMIT)
    ray_dist0 = jnp.where(a_near > 0.0, a_near, 0.0)
    max_ray_dist = C.PLANET_R * 10.0

    def cond(s):
        i, _, done = s
        return (i < cfg.land_march_steps) & jnp.any(~done)

    def body(s):
        i, ray_dist, done = s
        ro = pos + ray_dist[:, None] * direction
        dist = land_sdf(topo, ro, scale, cfg.bilinear_tracking)
        new_dist = ray_dist + dist
        stop = (new_dist > max_ray_dist) | (jnp.abs(dist) < new_dist * 1e-4)
        ray_dist = jnp.where(done, ray_dist, new_dist)
        return i + 1, ray_dist, done | stop

    _, ray_dist, _ = jax.lax.while_loop(cond, body, (0, ray_dist0, ~active))
    return jnp.where(active & (ray_dist < max_ray_dist), ray_dist, -1.0)


def _density4_naive(pos, clouds_tex, species, bilinear):
    from .pathtracer import get_clouds_density

    n = pos.shape[0]
    if species == "rmo":
        rmo = vol.get_density(vol.get_elevation(pos))
        return jnp.concatenate([rmo, jnp.zeros((n, 1))], axis=-1)
    c = get_clouds_density(clouds_tex, pos, bilinear=bilinear)
    return jnp.concatenate([jnp.zeros((n, 3)), c[:, None]], axis=-1)


def delta_track_naive(
    keys, ray_pos, ray_dir, t_start, t_max, extinctions, max_extinction,
    clouds_tex, species, active, cfg,
):
    """One-step-per-iteration Woodcock tracking against the global majorant
    (reference pathtracer.py:77-115). ``extinctions`` is (n, 4); channel 3 is
    the cloud extinction. Returns (event, t, interaction_id)."""
    n = t_start.shape[0]
    keys = rng.as_lane_keys(keys, n)
    valid = active & (t_max >= 0.0) & (t_start < t_max)
    inv_max = 1.0 / max_extinction
    t_max_safe = jnp.maximum(t_max, 0.0)

    def cond(s):
        i, _, done, _, _ = s
        return (i < cfg.max_tracking_steps) & jnp.any(~done)

    def body(s):
        i, t, done, event, iid = s
        u = rng.uniform(rng.fold(keys, i), (3,))  # (3, n)
        t_new = t - jnp.log(jnp.maximum(u[0], 1e-12)) * inv_max
        over = t_new >= t_max
        pos = ray_pos + jnp.minimum(t_new, t_max_safe)[:, None] * ray_dir
        ext = extinctions * _density4_naive(
            pos, clouds_tex, species, cfg.bilinear_tracking
        )
        total = jnp.sum(ext, axis=-1)
        real = u[1] < total * inv_max
        if species == "rmo":
            r = u[1] * max_extinction
            c0 = ext[:, 0]
            c01 = c0 + ext[:, 1]
            iid_new = jnp.where(
                r < c0, C.RAYLEIGH_ID, jnp.where(r < c01, C.MIE_ID, C.OZONE_ID)
            )
        else:
            iid_new = jnp.full((n,), C.CLOUD_ID, dtype=jnp.int32)
        scatters = u[2] < _ALBEDOS[iid_new]
        hit = (~done) & (~over) & real
        event = jnp.where(hit, jnp.where(scatters, SCATTER_EVENT, ABSORB_EVENT), event)
        iid = jnp.where(hit, iid_new, iid)
        t = jnp.where(done, t, t_new)
        done = done | over | hit
        return i + 1, t, done, event, iid

    init = (
        0, t_start, ~valid,
        jnp.full((n,), NULL_EVENT, dtype=jnp.int32),
        jnp.zeros((n,), dtype=jnp.int32),
    )
    _, t, _, event, iid = jax.lax.while_loop(cond, body, init)
    return event, t, iid


def ratio_track_naive(
    keys, ray_pos, ray_dir, t_start, t_max, extinctions, max_extinction,
    clouds_tex, species, active, cfg,
):
    """One-step-per-iteration ratio tracking (reference pathtracer.py:117-143)."""
    n = t_start.shape[0]
    keys = rng.as_lane_keys(keys, n)
    valid = active & (t_max >= 0.0) & (t_start < t_max)
    inv_max = 1.0 / max_extinction
    t_max_safe = jnp.maximum(t_max, 0.0)

    def cond(s):
        i, _, done, _ = s
        return (i < cfg.max_tracking_steps) & jnp.any(~done)

    def body(s):
        i, t, done, trans = s
        u = rng.uniform(rng.fold(keys, i))  # (n,)
        t_new = t - jnp.log(jnp.maximum(u, 1e-12)) * inv_max
        over = t_new >= t_max
        pos = ray_pos + jnp.minimum(t_new, t_max_safe)[:, None] * ray_dir
        ext = extinctions * _density4_naive(
            pos, clouds_tex, species, cfg.bilinear_tracking
        )
        total = jnp.sum(ext, axis=-1)
        trans = jnp.where(done | over, trans, trans * (1.0 - total * inv_max))
        done = done | over | (trans < 1e-5)
        t = jnp.where(done, t, t_new)
        return i + 1, t, done, trans

    init = (0, t_start, ~valid, jnp.ones((n,)))
    _, _, _, trans = jax.lax.while_loop(cond, body, init)
    return trans
