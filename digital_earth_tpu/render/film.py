"""HDR -> SDR film chain: OpenDRT and AgX display transforms, measured
camera-response curves, vignette, exposure/gamma, sRGB encode.

- OpenDRT follows Jed Smith's open-display-transform v0.2.2 math (GPL v3),
  the same version the reference ports (reference lib/OpenDRT.py:5-10), with
  the reference's compiled configuration: Rec.709 in/out, linear EOTF,
  Lp = 100 nits (lib/OpenDRT.py:39-55).
- AgX follows Troy Sobotka's AgX as shadered by Olivier Groulx — the
  reference ships it disabled (renderer.py:356); here it is a selectable DRT.
- Camera response: 1D per-channel LUT slices of the DoRF pack
  (reference renderer.py:333-344).

Everything operates on (..., 3) float arrays.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..ops.math_utils import mix, saturate
from ..ops.spectral import lum3, srgb_transfer

# ---------------------------------------------------------------------------
# OpenDRT (reference lib/OpenDRT.py)
# ---------------------------------------------------------------------------

# Compiled config (reference lib/OpenDRT.py:39-55)
LP = 100.0
GB = 0.12
CONTRAST = 1.0
FL = 0.005
RW = 0.25
BW = 0.35
DCH = 0.35
DCH_TOE = 0.0
HS_R = 0.3
HS_G = -0.1
HS_B = -0.2
V_P = 0.5

_MATRIX_REC709_TO_XYZ = np.array(
    [
        [0.412390917540, 0.357584357262, 0.180480793118],
        [0.212639078498, 0.715168714523, 0.072192311287],
        [0.019330825657, 0.119194783270, 0.950532138348],
    ],
    dtype=np.float32,
)
_MATRIX_XYZ_TO_REC709 = np.array(
    [
        [3.2409699419, -1.53738317757, -0.498610760293],
        [-0.969243636281, 1.87596750151, 0.041555057407],
        [0.055630079697, -0.203976958889, 1.05697151424],
    ],
    dtype=np.float32,
)
# in = Rec709, display = Rec709: the gamut round-trip composes to ~identity
# but we keep both multiplies for parity with the reference's chain
# (lib/OpenDRT.py:327-329).
_IN_TO_XYZ = _MATRIX_REC709_TO_XYZ
_XYZ_TO_DISPLAY = _MATRIX_XYZ_TO_REC709


def _sdiv(a, b):
    """Safe divide: 0 where |b| < 1e-4 (reference lib/OpenDRT.py:92-97)."""
    return jnp.where(jnp.abs(b) < 1e-4, 0.0, a / jnp.where(jnp.abs(b) < 1e-4, 1.0, b))


def _spow(a, b):
    """Safe power: passthrough for a <= 0 (reference lib/OpenDRT.py:111-116)."""
    return jnp.where(a <= 0.0, a, jnp.power(jnp.maximum(a, 1e-12), b))


def _tonescale(x, m, s, c, invert=False):
    """Daniele-curve tonescale (reference lib/OpenDRT.py:200-208)."""
    if not invert:
        return _spow(m * x / (x + s), c)
    ip = 1.0 / c
    return _spow(s * x, ip) / (m - _spow(x, ip))


def _flare(x, fl, invert=False):
    """Parabolic toe compression (reference lib/OpenDRT.py:211-218)."""
    if not invert:
        return _spow(x, 2.0) / (x + fl)
    return (x + jnp.sqrt(x * (4.0 * fl + x))) / 2.0


def _flare_scalar(x, fl):
    """Host-side inverse flare for the intersection constants."""
    return (x + math.sqrt(x * (4.0 * fl + x))) / 2.0


def _narrow_hue_angles(v):
    """Reference lib/OpenDRT.py:191-197."""
    r = jnp.clip(v[..., 0] - (v[..., 1] + v[..., 2]), 0.0, 2.0)
    g = jnp.clip(v[..., 1] - (v[..., 0] + v[..., 2]), 0.0, 2.0)
    b = jnp.clip(v[..., 2] - (v[..., 0] + v[..., 1]), 0.0, 2.0)
    return jnp.stack([r, g, b], axis=-1)


# Tonescale intersection constants (reference lib/OpenDRT.py:305-319),
# computed once at import for the compiled Lp=100 config.
_PX = 128.0 * math.log10(LP) / math.log10(100.0) - 64.0
_PY = LP / 100.0
_GX = 0.18
_GY = 11.696 / 100.0 * (1.0 + GB * math.log2(_PY))
_S0 = _flare_scalar(_GY, FL)
_M0 = _flare_scalar(_PY, FL)
_IP = 1.0 / CONTRAST
_S = (_PX * _GX * (_M0**_IP - _S0**_IP)) / (_PX * _S0**_IP - _GX * _M0**_IP)
_M = _M0**_IP * (_S + _PX) / _PX
_DS = 100.0 / LP  # linear EOTF display scale (reference lib/OpenDRT.py:270)
_CLAMP_MAX = _DS * LP / 100.0


def opendrt_transform(rgb):
    """OpenDRT HDR->SDR (reference lib/OpenDRT.py:221-485, linear-EOTF path)."""
    rgb = rgb @ jnp.asarray(_IN_TO_XYZ).T
    rgb = rgb @ jnp.asarray(_XYZ_TO_DISPLAY).T

    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)

    h_rgb = _narrow_hue_angles(_sdiv(rgb - mn[..., None], mx[..., None]))

    w = np.array([RW, 1.0, BW], dtype=np.float32)
    w = w / np.linalg.norm(w)
    wrgb = jnp.asarray(w) * jnp.maximum(rgb, 1e-5)
    lum = jnp.sqrt(jnp.sum(wrgb * wrgb, axis=-1))

    rats = _sdiv(rgb, lum[..., None])

    ts = _tonescale(lum, _M, _S, CONTRAST)
    ts = _flare(ts, FL)
    ts = ts * _DS

    dch_s = DCH / _S
    ccf = _sdiv(jnp.ones_like(lum), lum * dch_s + 1.0)
    toe_ccf = (DCH_TOE + 1.0) * _sdiv(lum, lum + DCH_TOE) * ccf

    hs_w = (1.0 - ccf)[..., None] * h_rgb
    rats = jnp.stack(
        [
            rats[..., 0] + hs_w[..., 2] * HS_B - hs_w[..., 1] * HS_G,
            rats[..., 1] + hs_w[..., 0] * HS_R - hs_w[..., 2] * HS_B,
            rats[..., 2] + hs_w[..., 1] * HS_G - hs_w[..., 0] * HS_R,
        ],
        axis=-1,
    )
    rats = 1.0 - toe_ccf[..., None] + rats * toe_ccf[..., None]
    rats = jnp.maximum(rats, 0.0)

    rats_mx = jnp.max(rats, axis=-1)
    rats_mn = jnp.min(rats, axis=-1)
    rats_ch = _sdiv(rats_mx - rats_mn, rats_mx)
    chf = _spow(rats_ch * ts, V_P)
    rats_n = _sdiv(rats, rats_mx[..., None])
    rats = rats_n * chf[..., None] + rats * (1.0 - chf[..., None])

    rgb = rats * ts[..., None]
    rgb = jnp.minimum(rgb, _CLAMP_MAX)
    return rgb  # linear EOTF: no inverse-EOTF power (reference lib/OpenDRT.py:477-478)


# ---------------------------------------------------------------------------
# AgX (reference lib/AgX.py)
# ---------------------------------------------------------------------------

AGX_MIDDLE_GREY = 0.18
AGX_SLOPE = 2.3
AGX_TOE_POWER = 1.9
AGX_SHOULDER_POWER = 3.1
AGX_COMPRESSION = 0.15
AGX_MIN_EV = -10.0
AGX_MAX_EV = 6.5
AGX_SATURATION = 1.4


def _xy_to_xyz(xy):
    x, y = xy
    return np.array([x / y, 1.0, (1.0 - x - y) / y])


def _primaries_to_matrix(xy_r, xy_g, xy_b, xy_w):
    """RGB->XYZ from chromaticities (reference lib/AgX.py:60-74)."""
    xyz_r, xyz_g, xyz_b = _xy_to_xyz(xy_r), _xy_to_xyz(xy_g), _xy_to_xyz(xy_b)
    xyz_w = _xy_to_xyz(xy_w)
    temp = np.array(
        [
            [xyz_r[0], xyz_g[0], xyz_b[0]],
            [1.0, 1.0, 1.0],
            [xyz_r[2], xyz_g[2], xyz_b[2]],
        ]
    )
    scale = np.linalg.inv(temp) @ xyz_w
    return np.array(
        [
            [scale[0] * xyz_r[0], scale[1] * xyz_g[0], scale[2] * xyz_b[0]],
            [scale[0] * xyz_r[1], scale[1] * xyz_g[1], scale[2] * xyz_b[1]],
            [scale[0] * xyz_r[2], scale[1] * xyz_g[2], scale[2] * xyz_b[2]],
        ]
    )


def _compression_matrix(xy_r, xy_g, xy_b, xy_w, compression):
    """Inset-primaries matrix (reference lib/AgX.py:77-84)."""
    s = 1.0 / (1.0 - compression)
    f = lambda xy: tuple((np.asarray(xy) - np.asarray(xy_w)) * s + np.asarray(xy_w))
    return _primaries_to_matrix(f(xy_r), f(xy_g), f(xy_b), xy_w)


_SRGB_CHROMA = ((0.64, 0.33), (0.3, 0.6), (0.15, 0.06), (0.3127, 0.3290))
_AGX_SRGB_TO_XYZ = _primaries_to_matrix(*_SRGB_CHROMA).astype(np.float32)
_AGX_XYZ_TO_ADJ = np.linalg.inv(
    _compression_matrix(*_SRGB_CHROMA, AGX_COMPRESSION)
).astype(np.float32)


def _agx_scale(x_pivot, y_pivot, slope_pivot, power):
    """Reference lib/AgX.py:97-98."""
    a = jnp.power(slope_pivot * x_pivot, -power)
    b = jnp.power(slope_pivot * (x_pivot / y_pivot), power) - 1.0
    return jnp.power(a * b, -1.0 / power)


def _agx_hyperbolic(x, power):
    return x / jnp.power(1.0 + jnp.power(jnp.abs(x), power), 1.0 / power)


def _agx_full_curve(x, x_pivot, y_pivot, slope_pivot, toe_power, shoulder_power):
    """Reference lib/AgX.py:100-127 (both branches evaluated, selected)."""
    above = x >= x_pivot
    sxp = jnp.where(above, 1.0 - x_pivot, x_pivot)
    syp = jnp.where(above, 1.0 - y_pivot, y_pivot)
    toe_scale = _agx_scale(sxp, syp, slope_pivot, toe_power)
    shoulder_scale = _agx_scale(sxp, syp, slope_pivot, shoulder_power)
    scale = jnp.where(above, shoulder_scale, -toe_scale)
    power = jnp.where(above, shoulder_power, toe_power)
    term = (slope_pivot * (x - x_pivot)) / scale
    return scale * _agx_hyperbolic(term, power) + y_pivot


def agx_transform(rgb):
    """AgX HDR Rec.709 -> LDR (reference lib/AgX.py:129-160)."""
    xyz = rgb @ jnp.asarray(_AGX_SRGB_TO_XYZ).T
    adjusted = xyz @ jnp.asarray(_AGX_XYZ_TO_ADJ).T

    x_pivot = abs(AGX_MIN_EV) / (AGX_MAX_EV - AGX_MIN_EV)
    y_pivot = 0.5
    log_v = jnp.clip(
        jnp.log2(jnp.maximum(adjusted, 1e-10) / AGX_MIDDLE_GREY), AGX_MIN_EV, AGX_MAX_EV
    )
    log_v = (log_v - AGX_MIN_EV) / (AGX_MAX_EV - AGX_MIN_EV)
    out = _agx_full_curve(
        log_v, x_pivot, y_pivot, AGX_SLOPE, AGX_TOE_POWER, AGX_SHOULDER_POWER
    )
    out = saturate(out)
    out = mix(lum3(out), out, AGX_SATURATION)
    return saturate(out)


# ---------------------------------------------------------------------------
# Camera response (reference renderer.py:333-344)
# ---------------------------------------------------------------------------


def camera_response(crf_curves, crf_index, tristimulus):
    """Per-channel 1D film-response LUT. crf_curves: (1024, n_films, 3);
    crf_index: traced int; tristimulus (..., 3) in [0, 1]."""
    res = crf_curves.shape[0]
    curve = jnp.take(crf_curves, crf_index, axis=1)  # (1024, 3)
    t = saturate(tristimulus)
    u_offset = 0.5 / res
    u = jnp.minimum(t + u_offset, 1.0 - u_offset)
    x = u * res - 0.5
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, res - 1)
    x1 = jnp.clip(x0 + 1, 0, res - 1)
    frac = x - x0.astype(jnp.float32)
    ch = jnp.arange(3)
    v0 = curve[x0, ch]
    v1 = curve[x1, ch]
    return saturate(v0 * (1.0 - frac) + v1 * frac)


# ---------------------------------------------------------------------------
# Full post chain (reference renderer.py:346-365)
# ---------------------------------------------------------------------------

VIGNETTE_STRENGTH = 0.9
VIGNETTE_RADIUS = 0.0
VIGNETTE_CENTER = (0.5, 0.5)


def postprocess(
    color_buffer, spp, exposure, gamma, crf_curves, crf_index, image_res,
    drt: str = "opendrt",
):
    """color_buffer (W, H, 3) accumulated linear RGB -> display sRGB in [0,1].

    Chain (reference renderer.py:346-365): /spp, vignette, 2^exposure, DRT
    (OpenDRT default / AgX selectable), camera response, gamma, sRGB OETF.
    """
    w, h = image_res
    u = jnp.arange(w, dtype=jnp.float32)[:, None] / w
    v = jnp.arange(h, dtype=jnp.float32)[None, :] / h
    darken = 1.0 - VIGNETTE_STRENGTH * jnp.maximum(
        jnp.sqrt((u - VIGNETTE_CENTER[0]) ** 2 + (v - VIGNETTE_CENTER[1]) ** 2)
        - VIGNETTE_RADIUS,
        0.0,
    )
    spp = jnp.maximum(spp, 1)
    linear = (
        color_buffer / spp * darken[..., None] * jnp.power(2.0, exposure)
    )
    if drt == "opendrt":
        tonemapped = opendrt_transform(linear)
    elif drt == "agx":
        tonemapped = agx_transform(linear)
    elif drt == "none":
        tonemapped = linear
    else:
        raise ValueError(f"unknown display transform {drt!r}")
    cam = camera_response(crf_curves, crf_index, tonemapped)
    graded = jnp.power(jnp.maximum(cam, 0.0), gamma)
    return saturate(srgb_transfer(graded))
