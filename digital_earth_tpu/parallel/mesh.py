"""Multi-chip rendering over a ``jax.sharding.Mesh``.

The reference is single-GPU (SURVEY.md §2.4); its only parallelism is the
per-pixel grid. Samples are embarrassingly parallel and the only reduction is
the accumulation-buffer sum, so the TPU-native scaling design is:

- a 2D mesh ("px", "spp"): the frame's pixel blocks are sharded across the
  "px" axis (each chip owns a contiguous range of blocks), and independent
  spp batches run across the "spp" axis;
- each device runs THE single-chip pipeline — renderer._trace_tile_range,
  with its stage compaction and class binning — on its block range, with
  per-lane RNG keyed by (frame key, global pixel id) (ops/rng.py);
- one ``psum`` over the "spp" axis merges the per-spp partial sums over ICI;
  the result stays sharded over "px" (gathered lazily only when the host
  fetches the image).

Because the pipeline and the RNG are layout-independent, the multi-chip
frame is **bit-identical** to the single-chip ``Renderer``'s for the same
seed — asserted in tests/test_parallel.py — so scaling out never changes
the image, only the wall-clock.

Textures and LUTs are replicated (they are tens of MB; sharding them would
put gathers on the wrong side of the ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render.camera import CameraParams
from ..render.params import SceneParams, TraceConfig
from ..render.renderer import Renderer, _pick_block_dims, _trace_tile_range


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


def _pick_sharded_block(w: int, h: int, tile_pixels: int, n_px: int):
    """Block dims whose tile count divides the px axis (largest block
    <= tile_pixels with that property)."""
    for target in range(tile_pixels, 0, -1):
        bw, bh = _pick_block_dims(w, h, target)
        if ((w // bw) * (h // bh)) % n_px == 0:
            return bw, bh
    raise ValueError((w, h, n_px))


def make_sharded_render_step(
    mesh: Mesh,
    image_res: Tuple[int, int],
    cfg: TraceConfig = TraceConfig(),
    tile_pixels: int = 2048,
):
    """Build a jitted multi-chip render step running the single-chip staged
    pipeline (renderer._trace_tile_range) on each device's block range.

    Returns ``(step, n_spp, block)`` where
    ``step(base_key, spp0, color_buffer, cam, scene, atlas, luts)`` adds
    ``n_spp`` spp to the tile-major flat (W*H, 3) accumulation buffer
    (sharded over "px"), and ``spp0`` is the global spp counter before the
    call — spp i uses ``fold_in(base_key, i)``, the exact key chain of the
    single-chip ``Renderer.accumulate``, so frames match it bit for bit.
    """
    w, h = image_res
    n_px = mesh.shape["px"]
    n_spp = mesh.shape["spp"]
    block = _pick_sharded_block(w, h, tile_pixels, n_px)
    bw, bh = block
    n_tiles = (w // bw) * (h // bh)
    tiles_per_dev = n_tiles // n_px

    def shard_fn(base_key, spp0, color_buffer, cam, scene, atlas, luts):
        px_idx = jax.lax.axis_index("px")
        spp_idx = jax.lax.axis_index("spp")
        rgb = _trace_tile_range(
            base_key, spp0 + spp_idx, cam, scene, atlas, luts, image_res,
            block, cfg, px_idx * tiles_per_dev, tiles_per_dev,
        )
        if n_spp > 1:
            # merge the spp batches over ICI; pixels stay sharded
            rgb = jax.lax.psum(rgb, "spp")
        return color_buffer + rgb

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P("px"), P(), P(), P(), P()),
        out_specs=P("px"),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(2,)), n_spp, block


class MultiChipRenderer(Renderer):
    """Multi-chip Renderer: the full single-chip API (``set_*``,
    ``accumulate()``, ``fetch_image()``, ``reset_framebuffer()``,
    checkpointing), executing over the device mesh — so the viewer and
    offline render paths run multi-chip by just constructing this class
    instead of Renderer (``main.py --multichip``). Each ``accumulate()``
    adds ``spp_per_step`` samples per pixel (one per "spp"-axis device).

    The accumulation buffer lives flat tile-major, sharded over "px";
    ``fetch_image``/``fetch_buffer`` reassemble the (W, H, 3) frame.
    ``accumulate(cam, scene)`` also accepts explicit params for the
    driver-dryrun/test call shape."""

    def __init__(
        self, mesh, image_res, atlas, luts, cfg=TraceConfig(), seed=0,
        tile_pixels=2048, **renderer_kwargs,
    ):
        super().__init__(
            image_res=image_res, atlas=atlas, luts=luts, cfg=cfg, seed=seed,
            tile_pixels=tile_pixels, **renderer_kwargs,
        )
        self.mesh = mesh
        self.step, self.spp_per_step, self.block = make_sharded_render_step(
            mesh, image_res, cfg, tile_pixels
        )
        self.tile = self.block[0] * self.block[1]
        self._sharding = NamedSharding(mesh, P("px"))
        self.color_buffer = self._zeros()

    def _zeros(self):
        w, h = self.image_res
        return jax.device_put(
            jnp.zeros((w * h, 3), dtype=jnp.float32), self._sharding
        )

    def reset_framebuffer(self):
        self.current_spp = 0
        self.color_buffer = self._zeros()

    def accumulate(self, cam: CameraParams = None, scene: SceneParams = None):
        cam = self._camera_params() if cam is None else cam
        scene = self._scene_params() if scene is None else scene
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

    def accumulate_interruptible(self, n_chunks, interrupt=None):
        """Multi-chip steps are already 1/n_px of the frame per chip; chunk
        striping is a single-chip latency tool. One whole step per call."""
        self.accumulate()
        return True

    def accumulate_adaptive(self, *args, **kwargs):
        raise NotImplementedError(
            "adaptive tile sampling is a single-chip Renderer feature for "
            "now (the sharded step renders fixed per-device tile ranges; "
            "per-device adaptive selection needs a gather of the sharded "
            "variance buffers)"
        )

    def _assembled_buffer(self):
        """Undo the tile-major block interleave -> (W, H, 3), on device."""
        w, h = self.image_res
        bw, bh = self.block
        nbx, nby = w // bw, h // bh
        return (
            self.color_buffer.reshape(nbx, nby, bw, bh, 3)
            .transpose(0, 2, 1, 3, 4)
            .reshape(w, h, 3)
        )

    def fetch_image(self):
        from ..render.renderer import _postprocess

        return _postprocess(
            self._assembled_buffer(),
            jnp.asarray(self.current_spp, dtype=jnp.float32),
            jnp.asarray(self.exposure, dtype=jnp.float32),
            jnp.asarray(self.gamma, dtype=jnp.float32),
            self.crf.curves,
            jnp.asarray(self.selected_crf, dtype=jnp.int32),
            self.image_res,
            self.drt,
        )

    def fetch_buffer(self):
        """(W, H, 3) accumulated linear RGB, gathered to host."""
        return np.asarray(self._assembled_buffer())

    def save_checkpoint(self, path: str):
        np.savez_compressed(
            path,
            color_buffer=self.fetch_buffer(),
            current_spp=self.current_spp,
            seed_key=np.asarray(self._base_key),
        )

    def load_checkpoint(self, path: str):
        with np.load(path) as z:
            frame = z["color_buffer"]  # (W, H, 3) assembled layout
            self.current_spp = int(z["current_spp"])
            self._base_key = jnp.asarray(z["seed_key"], dtype=jnp.uint32)
        w, h = self.image_res
        bw, bh = self.block
        nbx, nby = w // bw, h // bh
        flat = (
            frame.reshape(nbx, bw, nby, bh, 3)
            .transpose(0, 2, 1, 3, 4)
            .reshape(w * h, 3)
        )
        self.color_buffer = jax.device_put(
            jnp.asarray(flat, jnp.float32), self._sharding
        )
