"""Earth surface BRDF: Disney diffuse + land GGX / ocean Beckmann-GGX blend.

Physics matches the reference lib/surface_rendering_models.py (cited per
function); everything is batched jnp over wavefront arrays.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..ops.math_utils import dot, mix, normalize, saturate, smoothstep, sqr

DIFFUSE_FACTOR = 0.28
SPECULAR_FACTOR = 0.5

LAND_ROUGHNESS = 0.73
LAND_F0 = 0.04
OCEAN_F0 = 0.02


def disney_diffuse(roughness, n_dot_l, n_dot_v, l_dot_h):
    """Reference surface_rendering_models.py:40-51."""
    r_r = 2.0 * roughness * sqr(l_dot_h)
    f_l = jnp.power(1.0 - n_dot_l, 5.0)
    f_v = jnp.power(1.0 - n_dot_v, 5.0)
    f_lambert = 1.0 / math.pi
    f_retro = f_lambert * r_r * (f_l + f_v + f_l * f_v * (r_r - 1.0))
    return f_lambert * (1.0 - 0.5 * f_l) * (1.0 - 0.5 * f_v) + f_retro


def ggx_d(n_dot_h, alpha2):
    """Reference surface_rendering_models.py:83-85."""
    den = (alpha2 - 1.0) * n_dot_h * n_dot_h + 1.0
    return alpha2 / (math.pi * den * den)


def lambda_smith(n_dot_x, alpha2):
    """Reference surface_rendering_models.py:89-91."""
    n_dot_x2 = jnp.maximum(n_dot_x * n_dot_x, 1e-12)
    return (-1.0 + jnp.sqrt(alpha2 * (1.0 - n_dot_x2) / n_dot_x2 + 1.0)) * 0.5


def g1_smith(n_dot_v, alpha2):
    return 1.0 / (1.0 + lambda_smith(n_dot_v, alpha2))


def g2_smith(n_dot_l, n_dot_v, alpha2):
    """Height-correlated masking-shadowing
    (reference surface_rendering_models.py:100-104)."""
    return 1.0 / (1.0 + lambda_smith(n_dot_v, alpha2) + lambda_smith(n_dot_l, alpha2))


def schlick_fresnel(v_dot_h, f0):
    """Reference surface_rendering_models.py:106-108 (unused by earth_brdf,
    kept for capability parity)."""
    return f0 + (1.0 - f0) * jnp.power(1.0 - v_dot_h, 5.0)


def fresnel_dielectric(v_dot_h, f0):
    """Exact dielectric Fresnel parameterized by F0
    (reference surface_rendering_models.py:110-122)."""
    eta = jnp.sqrt(f0)
    eta = (1.0 + eta) / (1.0 - eta)
    sin_theta_i = jnp.sqrt(saturate(1.0 - sqr(v_dot_h)))
    sin_theta_t = sin_theta_i / jnp.maximum(eta, 1e-8)
    cos_theta_t = jnp.sqrt(jnp.maximum(1.0 - sqr(sin_theta_t), 0.0))
    r_s = sqr(
        (v_dot_h - eta * cos_theta_t) / jnp.maximum(v_dot_h + eta * cos_theta_t, 1e-8)
    )
    r_p = sqr(
        (cos_theta_t - eta * v_dot_h) / jnp.maximum(cos_theta_t + eta * v_dot_h, 1e-8)
    )
    return saturate((r_s + r_p) * 0.5)


def ggx_smith_specular(roughness, f0, n_dot_l, n_dot_v, l_dot_h, n_dot_h):
    """Reference surface_rendering_models.py:70-80. Note the reference squares
    roughness once: alpha2 = roughness^2."""
    alpha2 = roughness * roughness
    d = ggx_d(n_dot_h, alpha2)
    g = g2_smith(n_dot_l, n_dot_v, alpha2)
    f = fresnel_dielectric(l_dot_h, f0)
    return d * g * f / jnp.maximum(4.0 * n_dot_l * n_dot_v, 1e-5)


def sample_ggx_vndf(v_tangent, u0, u1, alpha):
    """Visible-NDF GGX half-vector sampling (spherical-caps form) — present
    but unused in the reference (surface_rendering_models.py:125-144); kept
    for capability parity. ``v_tangent`` (..., 3) is the view direction in
    tangent space; returns the sampled half vector in tangent space."""
    vs = normalize(
        jnp.concatenate([v_tangent[..., :2] * alpha, v_tangent[..., 2:]], axis=-1)
    )
    phi = 2.0 * math.pi * u0
    z = (1.0 - u1) * (1.0 + vs[..., 2]) - vs[..., 2]
    xy_scale = jnp.sqrt(saturate(1.0 - z * z))
    hemi = jnp.stack(
        [jnp.cos(phi) * xy_scale, jnp.sin(phi) * xy_scale, z], axis=-1
    )
    h = hemi + vs
    return normalize(
        jnp.concatenate([h[..., :2] * alpha, h[..., 2:]], axis=-1)
    )


def beckmann_isotropic_ndf(n_dot_h, alpha):
    """Reference surface_rendering_models.py:147-152."""
    cos_theta2 = jnp.maximum(n_dot_h * n_dot_h, 1e-12)
    alpha2 = alpha * alpha
    exponent = (1.0 - cos_theta2) / (alpha2 * cos_theta2)
    denom = math.pi * alpha2 * cos_theta2 * cos_theta2
    return jnp.exp(-exponent) / jnp.maximum(denom, 1e-5)


def g2_vcavity(n_dot_l, n_dot_v, n_dot_h, v_dot_h):
    """V-cavity masking-shadowing (reference surface_rendering_models.py:169-171)."""
    v_dot_h = jnp.maximum(v_dot_h, 1e-8)
    return jnp.minimum(
        1.0,
        jnp.minimum(
            2.0 * n_dot_v * n_dot_h / v_dot_h, 2.0 * n_dot_l * n_dot_h / v_dot_h
        ),
    )


def beckmann_specular(roughness, f0, n_dot_l, n_dot_v, l_dot_h, n_dot_h):
    """Beckmann NDF with V-cavity visibility
    (reference surface_rendering_models.py:54-67; alpha = 2*roughness^2)."""
    alpha = roughness * roughness * 2.0
    d = beckmann_isotropic_ndf(n_dot_h, alpha)
    v = g2_vcavity(n_dot_l, n_dot_v, n_dot_h, l_dot_h)
    f = fresnel_dielectric(l_dot_h, f0)
    return d * v * f


def earth_brdf_parts(oceanness, bathymetry, v, n, l):
    """Albedo-independent decomposition of earth_brdf: returns
    (diffuse_term, specular_term, n_dot_l) with
    brdf = albedo * diffuse_term + specular_term. The full BRDF is linear in
    the (spectral) albedo, so a hero-wavelength packet evaluates the
    geometry once and combines per wavelength."""
    h = normalize(v + l)
    n_dot_l = saturate(dot(n, l))
    n_dot_v = saturate(dot(n, v))
    l_dot_h = saturate(dot(l, h))
    n_dot_h = saturate(dot(n, h))

    ocean_roughness = mix(0.23 + 0.02, 0.23 - 0.04, smoothstep(0.3, 0.7, bathymetry))
    diffuse = disney_diffuse(LAND_ROUGHNESS, n_dot_l, n_dot_v, l_dot_h)
    land_specular = ggx_smith_specular(
        LAND_ROUGHNESS, LAND_F0, n_dot_l, n_dot_v, l_dot_h, n_dot_h
    )
    ocean_specular_ggx = ggx_smith_specular(
        ocean_roughness, OCEAN_F0, n_dot_l, n_dot_v, l_dot_h, n_dot_h
    )
    ocean_specular_beckmann = 0.65 * beckmann_specular(
        ocean_roughness, OCEAN_F0, n_dot_l, n_dot_v, l_dot_h, n_dot_h
    )
    ocean_specular = mix(
        ocean_specular_beckmann,
        ocean_specular_ggx,
        jnp.clip(smoothstep(0.2, 0.95, n_dot_v), 0.05, 0.94),
    )
    specular_blender = smoothstep(0.6, 1.0, oceanness)
    specular = mix(land_specular, ocean_specular, specular_blender) * SPECULAR_FACTOR
    return diffuse * DIFFUSE_FACTOR, specular, n_dot_l


def earth_brdf(albedo, oceanness, bathymetry, v, n, l):
    """Full Earth surface BRDF (reference surface_rendering_models.py:10-37).

    albedo is the scalar spectral albedo at the hero wavelength; oceanness
    and bathymetry come from the land-ocean mask / bathymetry textures.
    Returns (brdf, n_dot_l). Composed from earth_brdf_parts so the two
    entry points cannot diverge.
    """
    diffuse_term, specular_term, n_dot_l = earth_brdf_parts(
        oceanness, bathymetry, v, n, l
    )
    return albedo * diffuse_term + specular_term, n_dot_l
