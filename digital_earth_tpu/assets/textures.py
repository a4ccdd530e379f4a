"""Texture configuration and loading into a device pytree.

Mirrors the role of the reference lib/textures.py (quality tiers + file
paths) and renderer.py:60-94 (upload). Real NASA equirect imagery is used
when present under ``textures/``; otherwise a deterministic procedural set is
synthesized (assets/procgen.py) so the renderer is always runnable.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .procgen import cached_earth_textures

# Quality tiers, mirroring reference lib/textures.py:1-8. Tier 0 = 4K is the
# default here (SURVEY.md §7: ship 4K first, tier up later).
TEXTURE_QUALITY = int(os.environ.get("DE_TEXTURE_QUALITY", "0"))
TEX_RES_4K = (3840, 1920)
TEX_RES_8K = (8100, 4050)
TEX_RES_10K = (10800, 5400)
TEX_RES_16K = (16200, 8100)
TEX_RES_21K = (21600, 10800)

_TIER_FILES = {
    0: dict(
        albedo="earth_color_4K.png",
        topography="topography_4K.png",
        ocean="earth_landocean_4K.png",
        clouds="earth_clouds_4K.png",
        bathymetry="earth_bathymetry_4k.png",
        emissive="earth_nightlights_4K.png",
        stars="stars_8K.jpg",
    ),
    1: dict(
        albedo="earth_color_10K.png",
        topography="topography_10K.png",
        ocean="earth_landocean_8K.png",
        clouds="earth_clouds_8K.png",
        bathymetry="earth_bathymetry_10k.png",
        emissive="earth_nightlights_10K.png",
        stars="stars_16K.png",
    ),
    2: dict(
        albedo="earth_color_21K.png",
        topography="topography_21K.png",
        ocean="earth_landocean_16K.png",
        clouds="earth_clouds_21K.png",
        bathymetry="earth_bathymetry_21k.png",
        emissive="earth_nightlights_21K.png",
        stars="stars_16K.png",
    ),
}

_SINGLE_CHANNEL = ("topography", "ocean", "clouds", "bathymetry", "emissive")


class TextureAtlas(NamedTuple):
    """All scene textures as device arrays, (H, W[, 3]) uint8, row 0 = north.

    topography_width is static metadata used for the finite-difference normal
    epsilon (reference pathtracer.py:20 uses pi*planet_r/tex_width).
    """

    albedo: jnp.ndarray
    topography: jnp.ndarray
    ocean: jnp.ndarray
    clouds: jnp.ndarray
    bathymetry: jnp.ndarray
    emissive: jnp.ndarray
    stars: jnp.ndarray


def _load_image(path: str, single_channel: bool) -> np.ndarray:
    from PIL import Image

    Image.MAX_IMAGE_PIXELS = None  # 21600x10800 tiers exceed PIL's default cap
    img = np.asarray(Image.open(path))
    if single_channel:
        if img.ndim == 3:
            img = img[..., 0]
    else:
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        img = img[..., :3]
    return img.astype(np.uint8)


def load_texture_atlas(
    texture_dir: str = "textures",
    quality: Optional[int] = None,
    procedural_resolution=(1024, 2048),
    procedural_seed: int = 7,
) -> TextureAtlas:
    """Load real textures when available, else the procedural fallback.

    Per-texture fallback: any missing file is substituted procedurally, so a
    partial NASA download still works.
    """
    quality = TEXTURE_QUALITY if quality is None else quality
    files = _TIER_FILES[quality]
    arrays = {}
    missing = []
    for name, fn in files.items():
        path = os.path.join(texture_dir, fn)
        if os.path.exists(path):
            arrays[name] = _load_image(path, name in _SINGLE_CHANNEL)
        else:
            missing.append(name)
    if missing:
        proc = cached_earth_textures(procedural_resolution, procedural_seed)
        for name in missing:
            arrays[name] = proc[name]
    return TextureAtlas(**{k: jnp.asarray(v) for k, v in arrays.items()})


def procedural_texture_atlas(resolution=(1024, 2048), seed: int = 7) -> TextureAtlas:
    proc = cached_earth_textures(resolution, seed)
    return TextureAtlas(**{k: jnp.asarray(v) for k, v in proc.items()})
