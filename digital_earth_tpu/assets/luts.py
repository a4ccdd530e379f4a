"""Spectral LUT loading into a device-friendly pytree.

The committed .npz assets are produced by tools/gen_luts.py (see its header
for provenance); this module mirrors the LUT-loading role of the reference
renderer.py:96-134.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


class SpectralLUTs(NamedTuple):
    """Device arrays used by the spectral pipeline.

    cie_cdf:      (441, 3) per-channel cumulative CMF, ends at (1,1,1)
    cie_response: (441, 3) XYZ response per nm on [390, 831)
    srgb2spec:    (300, 3) sRGB->spectrum basis on [400, 700)
    o3_crossec:   (441,)   ozone cross sections per nm on [390, 831)
    """

    cie_cdf: jnp.ndarray
    cie_response: jnp.ndarray
    srgb2spec: jnp.ndarray
    o3_crossec: jnp.ndarray


class CRFPack(NamedTuple):
    """Camera response function stack: curves (1024, n_films, 3) + names."""

    curves: jnp.ndarray
    names: tuple


def load_spectral_luts(data_dir: str = DATA_DIR, source: str = None) -> SpectralLUTs:
    """Load the spectral tables.

    ``source``: "reference" (the reference's own measured tables, converted
    by ``tools/gen_luts.py --reference-luts`` — the observer the <1%
    spectral-parity gate is defined against), "generated" (the analytic
    Wyman-Sloan-Shirley 1931 fit + home least-squares srgb2spec basis), or
    None: the ``DE_LUT_SOURCE`` env var, defaulting to "reference" when the
    ``*_ref.npz`` files exist.
    """
    if source is None:
        source = os.environ.get("DE_LUT_SOURCE")
    if source is None:
        source = (
            "reference"
            if os.path.exists(os.path.join(data_dir, "cie_lut_ref.npz"))
            else "generated"
        )
    suffix = "_ref" if source == "reference" else ""
    cie = np.load(os.path.join(data_dir, f"cie_lut{suffix}.npz"))
    s2s = np.load(os.path.join(data_dir, f"srgb2spec{suffix}.npz"))
    o3 = np.load(os.path.join(data_dir, f"ozone_lut{suffix}.npz"))
    return SpectralLUTs(
        cie_cdf=jnp.asarray(cie["cdf"], dtype=jnp.float32),
        cie_response=jnp.asarray(cie["response"], dtype=jnp.float32),
        srgb2spec=jnp.asarray(s2s["basis"], dtype=jnp.float32),
        o3_crossec=jnp.asarray(o3["cross_section"], dtype=jnp.float32),
    )


def load_crf_pack(data_dir: str = DATA_DIR) -> CRFPack:
    pack = np.load(os.path.join(data_dir, "crf_pack.npz"))
    return CRFPack(
        curves=jnp.asarray(pack["curves"], dtype=jnp.float32),
        names=tuple(str(n) for n in pack["names"]),
    )
