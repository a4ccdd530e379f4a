"""Deterministic ray-marching fast-preview renderer.

The reference carries an unused single-scatter ray marcher alongside the path
tracer (reference pathtracer.py:471-684, `ray_marcher`/`ray_marh_atmos`/
`ray_march_transmittance`); SURVEY.md §7 flags it as worth rebuilding as a
fast-preview mode. This is that mode: fixed-step quadrature of single
scattering (64 steps, 16-step sun transmittance), plus the same surface
shading path as the reference's marcher — noise-free at 1 spp, ideal for
interactive navigation; switch to the path tracer for final frames.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .. import constants as C
from ..models import surface as srf
from ..models import volume as vol
from ..ops import math_utils as mu
from ..ops import sampling as smp
from ..ops import spectral as sp
from ..ops import texture as tx
from .params import SceneParams, TraceConfig
from .pathtracer import get_land_material, intersect_land, land_normal

_TRANSMITTANCE_STEPS = 16
_MARCH_STEPS = 64


def _ray_march_transmittance(ray_pos, ray_dir, rmo_extinction):
    """16-step quadrature of sun transmittance
    (reference pathtracer.py:471-500)."""
    _, planet_far = mu.rsi(ray_pos, ray_dir, C.PLANET_R)
    occluded = planet_far > 0.0
    _, a_far = mu.rsi(ray_pos, ray_dir, C.ATMOS_UPPER_LIMIT)
    t_max = jnp.where(a_far < 0.0, -1.0, a_far)
    dd = t_max / _TRANSMITTANCE_STEPS

    def body(i, carry):
        od, pos = carry
        density = vol.get_density(vol.get_elevation(pos))
        od = od + density * dd[:, None]
        return od, pos + dd[:, None] * ray_dir

    od, _ = jax.lax.fori_loop(
        0, _TRANSMITTANCE_STEPS, body, (jnp.zeros_like(ray_pos), ray_pos)
    )
    trans = jnp.exp(-jnp.sum(rmo_extinction * od, axis=-1))
    return jnp.where(occluded, 0.0, trans)


def _ray_march_atmos(
    ray_pos, ray_dir, t_start, t_max, sun_dir, rmo_extinction, rm_scattering
):
    """64-step single-scatter march through the RMO atmosphere
    (reference pathtracer.py:502-542)."""
    n = ray_pos.shape[0]
    dd = (t_max - t_start) / _MARCH_STEPS
    start = ray_pos + t_start[:, None] * ray_dir
    cos_theta = jnp.sum(ray_dir * sun_dir, axis=-1)
    phase = jnp.stack(
        [vol.rayleigh_phase(cos_theta), vol.mie_phase(cos_theta)], axis=-1
    )

    def body(i, carry):
        in_scatter, trans, pos = carry
        h = vol.get_elevation(pos)
        density = vol.get_density(h)
        step_od = jnp.sum(rmo_extinction * density * dd[:, None], axis=-1)
        step_trans = mu.saturate(jnp.exp(-step_od))
        step_integral = mu.saturate(
            (1.0 - step_trans) / jnp.maximum(step_od, 1e-8)
        )
        visible = trans * step_integral
        sun_trans = _ray_march_transmittance(pos, sun_dir, rmo_extinction)
        step_scatter = jnp.sum(rm_scattering * density[:, :2] * phase, axis=-1)
        in_scatter = in_scatter + step_scatter * sun_trans * visible * dd
        trans = trans * step_trans
        return in_scatter, trans, pos + dd[:, None] * ray_dir

    in_scatter, trans, _ = jax.lax.fori_loop(
        0, _MARCH_STEPS, body, (jnp.zeros(n), jnp.ones(n), start)
    )
    return in_scatter, trans


@partial(jax.jit, static_argnames=("cfg",))
def march_paths(key, ray_pos, ray_dir, wavelength, scene: SceneParams, atlas, luts,
                cfg: TraceConfig = TraceConfig()):
    """Deterministic single-scatter estimate of one spectral sample per lane
    (reference pathtracer.py:544-684, bounce budget 3)."""
    n = ray_pos.shape[0]
    scale = scene.land_height_scale

    sun_power = sp.plancks(C.SUN_TEMPERATURE, wavelength)
    nightlights_power = (
        sp.plancks(C.NIGHTLIGHT_TEMPERATURE, wavelength) * C.NIGHTLIGHT_SCALE
    )
    sun_irradiance = sun_power * mu.cone_angle_to_solid_angle(
        scene.sun_angular_radius
    )
    ext_rmo = jnp.stack(
        [
            vol.spectra_extinction_rayleigh(wavelength),
            vol.spectra_extinction_mie(wavelength),
            vol.spectra_extinction_ozone(wavelength, luts.o3_crossec),
        ],
        axis=-1,
    )
    scattering = jnp.stack(
        [ext_rmo[:, 0] * C.RAYLEIGH_ALBEDO, ext_rmo[:, 1] * C.AEROSOL_ALBEDO],
        axis=-1,
    )
    light_direction = jnp.broadcast_to(scene.light_direction, (n, 3))

    accum = jnp.zeros(n)
    throughput = jnp.ones(n)
    pos = ray_pos
    direction = ray_dir
    alive = jnp.ones(n, bool)
    primary_miss = jnp.zeros(n, bool)

    # 3 deterministic bounces (reference pathtracer.py:576)
    for bounce in range(3):
        k_cone, k_hemi, key = jax.random.split(key, 3)
        earth = intersect_land(atlas.topography, pos, direction, scale, alive, cfg)
        a_near, a_far = mu.rsi(pos, direction, C.ATMOS_UPPER_LIMIT)
        t_start = jnp.maximum(0.0, a_near)
        t_max = jnp.where(earth > 0.0, earth, a_far)
        crosses = a_far >= 0.0
        primary_miss = primary_miss | (alive & ~crosses & (bounce == 0))
        alive = alive & crosses

        u_c = jax.random.uniform(k_cone, (2, n))
        light_dir = smp.sample_cone_oriented(
            u_c[0], u_c[1], scene.sun_cos_angle, light_direction
        )
        in_scatter, trans = _ray_march_atmos(
            pos, direction, t_start, t_max, light_dir, ext_rmo, scattering
        )
        accum = accum + jnp.where(alive, throughput * in_scatter, 0.0)
        throughput = jnp.where(alive, throughput * trans, throughput)

        surface = alive & (earth > 0.0)
        earth_safe = jnp.where(surface, earth, 0.0)
        land_pos = pos + earth_safe[:, None] * direction
        normal = land_normal(atlas.topography, land_pos, scale, cfg.bilinear_materials)
        albedo_srgb, ocean, bathymetry, emissive = get_land_material(
            atlas, land_pos, cfg.bilinear_materials
        )
        albedo = sp.srgb_to_spectrum(luts.srgb2spec, albedo_srgb, wavelength)
        accum = accum + jnp.where(
            surface, throughput * emissive * nightlights_power, 0.0
        )
        offset_pos = land_pos * (1.0 + 0.0001 * scale / 12000.0)
        shadow = intersect_land(
            atlas.topography, offset_pos, light_dir, scale, surface, cfg
        )
        visible = (shadow < 0.0).astype(jnp.float32)
        d_brdf, d_ndl = srf.earth_brdf(
            albedo, ocean, bathymetry, -direction, normal, light_dir
        )
        accum = accum + jnp.where(
            surface, throughput * visible * sun_irradiance * d_brdf * d_ndl, 0.0
        )
        u_h = jax.random.uniform(k_hemi, (2, n))
        hemi = smp.sample_hemisphere_cosine_weighted(u_h[0], u_h[1], normal)
        b_brdf, _ = srf.earth_brdf(
            albedo, ocean, bathymetry, -direction, normal, hemi
        )
        direction = jnp.where(surface[:, None], hemi, direction)
        pos = jnp.where(surface[:, None], offset_pos, pos)
        throughput = jnp.where(surface, throughput * b_brdf * math.pi, throughput)
        alive = surface  # non-surface rays terminate after their march

    # miss shading (reference pathtracer.py:671-679)
    sun_hit = primary_miss & (
        jnp.sum(scene.light_direction * ray_dir, axis=-1) > scene.sun_cos_angle
    )
    accum = accum + jnp.where(sun_hit, sun_power, 0.0)
    stars_srgb = tx.sample_dir_texture(atlas.stars, ray_dir, cfg.bilinear_materials)
    stars_power = sp.srgb_to_spectrum(luts.srgb2spec, stars_srgb, wavelength)
    accum = accum + jnp.where(primary_miss, stars_power * sun_power * C.STARS_SCALE, 0.0)

    return jnp.where(jnp.isfinite(accum) & (accum >= 0.0), accum, 0.0)
