"""Multi-chip rendering over a ``jax.sharding.Mesh``.

The reference is single-GPU (SURVEY.md §2.4); its only parallelism is the
per-pixel grid. Samples are embarrassingly parallel and the only reduction is
the accumulation-buffer sum, so the TPU-native scaling design is:

- a 2D mesh ("px", "spp"): the flattened pixel grid is sharded across the
  "px" axis (each chip owns a contiguous pixel slab), and independent spp
  batches run across the "spp" axis;
- each device traces its (pixel-shard x spp-batch) wavefront with a
  device-unique fold of the frame key;
- one ``psum`` over the "spp" axis merges the per-spp partial sums over ICI;
  the result stays sharded over "px" (gathered lazily only when the host
  fetches the image).

Textures and LUTs are replicated (they are tens of MB; sharding them would
put gathers on the wrong side of the ICI).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import spectral as sp
from ..render.camera import CameraParams, cast_dirs
from ..render.params import SceneParams, TraceConfig
from ..render.pathtracer import trace_paths


def make_render_mesh(
    devices: Optional[Sequence] = None, spp_axis: Optional[int] = None
) -> Mesh:
    """Build the ("px", "spp") render mesh over the given devices.

    ``spp_axis`` controls how many devices trace independent spp batches;
    default: 2 when the device count is even, else 1.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if spp_axis is None:
        spp_axis = 2 if n % 2 == 0 and n > 1 else 1
    assert n % spp_axis == 0, (n, spp_axis)
    arr = np.array(devices).reshape(n // spp_axis, spp_axis)
    return Mesh(arr, ("px", "spp"))


def _tile_colors(key, cam, scene, atlas, luts, pixel_flat, image_res, cfg):
    """Trace one spectral sample for a flat batch of pixel indices."""
    n = pixel_flat.shape[0]
    h = image_res[1]
    k_ju, k_jv, k_wl, k_tr = jax.random.split(key, 4)
    pu = (pixel_flat // h).astype(jnp.float32)
    pv = (pixel_flat % h).astype(jnp.float32)
    dirs = cast_dirs(
        cam, pu, pv,
        jax.random.uniform(k_ju, (n,)),
        jax.random.uniform(k_jv, (n,)),
        image_res,
    )
    pos = jnp.broadcast_to(cam.position, (n, 3))
    u = jax.random.uniform(k_wl, (n,))
    wavelengths, responses, lambda_pdf = sp.spectrum_sample_hero(
        u, luts.cie_cdf, luts.cie_response, cfg.hero_lambdas
    )
    radiance = trace_paths(
        k_tr, pos, dirs, wavelengths, scene, atlas, luts, cfg,
        lambda_pdf=lambda_pdf,
    )
    return sp.xyz_to_rgb(jnp.einsum("nl,nlc->nc", radiance, responses))


def _pick_tile(total: int, n_px: int, tile_pixels: int) -> int:
    """Largest divisor of ``total`` that is <= tile_pixels and yields a tile
    count divisible by the px axis."""
    for d in range(min(tile_pixels, total), 0, -1):
        if total % d == 0 and (total // d) % n_px == 0:
            return d
    raise ValueError((total, n_px, tile_pixels))


def make_sharded_render_step(
    mesh: Mesh,
    image_res: Tuple[int, int],
    cfg: TraceConfig = TraceConfig(),
    tile_pixels: int = 1600,
):
    """Build a jitted multi-chip render step.

    Returns ``step(base_key, spp0, color_buffer, cam, scene, atlas, luts)``
    where ``color_buffer`` is the (W*H, 3) flat accumulation buffer sharded
    over "px" and ``spp0`` the global spp counter before this step. Each call
    adds ``mesh.shape['spp']`` spp.

    Determinism across mesh shapes: the pixel grid is cut into fixed tiles
    and every tile's randomness is keyed by (base_key, global spp index,
    *global* tile index) — never by a device's mesh coordinate — so renders
    with the same seed and ``tile_pixels`` are bit-identical no matter how
    the tiles are spread over the "px" axis (asserted by
    tests/test_parallel.py). Pass the same ``tile_pixels`` when comparing
    mesh shapes; the tile count must divide by every px-axis size used.
    """
    w, h = image_res
    total = w * h
    n_px = mesh.shape["px"]
    n_spp = mesh.shape["spp"]
    tile = _pick_tile(total, n_px, tile_pixels)
    tiles_per_dev = (total // tile) // n_px

    def shard_fn(base_key, spp0, color_buffer, cam, scene, atlas, luts):
        px_idx = jax.lax.axis_index("px")
        spp_idx = jax.lax.axis_index("spp")
        spp_key = jax.random.fold_in(base_key, spp0 + spp_idx)

        def render_tile(local_t):
            global_t = px_idx * tiles_per_dev + local_t
            tkey = jax.random.fold_in(spp_key, global_t)
            pixel_flat = global_t * tile + jnp.arange(tile)
            return _tile_colors(
                tkey, cam, scene, atlas, luts, pixel_flat, image_res, cfg
            )

        colors = jax.lax.map(render_tile, jnp.arange(tiles_per_dev))
        colors = colors.reshape(tiles_per_dev * tile, 3)
        # merge the spp batches over ICI; pixels stay sharded
        colors = jax.lax.psum(colors, "spp")
        return color_buffer + colors

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P("px"), P(), P(), P(), P()),
        out_specs=P("px"),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(2,)), n_spp


class MultiChipRenderer:
    """Thin multi-chip accumulation driver around the sharded step.

    Mirrors the Renderer accumulate/fetch contract; each ``accumulate()``
    adds ``spp_per_step`` samples per pixel (one per "spp"-axis device).
    """

    def __init__(
        self, mesh, image_res, atlas, luts, cfg=TraceConfig(), seed=0,
        tile_pixels=1600,
    ):
        self.mesh = mesh
        self.image_res = tuple(image_res)
        self.atlas = atlas
        self.luts = luts
        self.cfg = cfg
        self.step, self.spp_per_step = make_sharded_render_step(
            mesh, image_res, cfg, tile_pixels
        )
        self._base_key = jax.random.PRNGKey(seed)
        self.current_spp = 0
        sharding = NamedSharding(mesh, P("px"))
        self.color_buffer = jax.device_put(
            jnp.zeros((image_res[0] * image_res[1], 3), dtype=jnp.float32), sharding
        )

    def accumulate(self, cam: CameraParams, scene: SceneParams):
        self.color_buffer = self.step(
            self._base_key,
            jnp.asarray(self.current_spp, dtype=jnp.int32),
            self.color_buffer,
            cam,
            scene,
            self.atlas,
            self.luts,
        )
        self.current_spp += self.spp_per_step

    def fetch_buffer(self):
        """(W, H, 3) accumulated linear RGB, gathered to host."""
        w, h = self.image_res
        return np.asarray(self.color_buffer).reshape(w, h, 3)
