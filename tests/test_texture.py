import jax.numpy as jnp
import numpy as np
import pytest

from digital_earth_tpu.assets.procgen import generate_earth_textures
from digital_earth_tpu.assets.textures import procedural_texture_atlas
from digital_earth_tpu.ops import texture as tx


class TestEquirectSampling:
    def test_constant_texture(self):
        tex = jnp.full((8, 16), 128, dtype=jnp.uint8)
        v = tx.sample_equirect(tex, jnp.array([0.1, 0.5, 0.93]), jnp.array([0.2, 0.5, 0.99]))
        np.testing.assert_allclose(np.asarray(v), 128 / 255, atol=1e-6)

    def test_texel_center_exact(self):
        tex = jnp.arange(32, dtype=jnp.float32).reshape(4, 8)
        # texel (row 1, col 3) center: u=(3+0.5)/8, v flipped: row = (1-v)*4-0.5 = 1 -> v = 1 - 1.5/4
        u = jnp.array((3 + 0.5) / 8)
        v = jnp.array(1.0 - (1 + 0.5) / 4)
        val = tx.sample_equirect(tex, u, v)
        assert float(val) == pytest.approx(float(tex[1, 3]))

    def test_u_wraps(self):
        tex = jnp.arange(16, dtype=jnp.float32).reshape(2, 8)
        a = tx.sample_equirect(tex, jnp.array(0.0), jnp.array(0.25))
        b = tx.sample_equirect(tex, jnp.array(1.0), jnp.array(0.25))
        assert float(a) == pytest.approx(float(b), abs=1e-5)

    def test_sample_sphere_texture_poles(self):
        tex = jnp.zeros((8, 16), dtype=jnp.float32).at[0, :].set(1.0)  # north row
        north = tx.sample_sphere_texture(tex, jnp.array([0.0, 1.0, 0.0]))
        south = tx.sample_sphere_texture(tex, jnp.array([0.0, -1.0, 0.0]))
        assert float(north) == pytest.approx(1.0)
        assert float(south) == pytest.approx(0.0)

    def test_batched_shapes(self):
        tex = jnp.zeros((16, 32, 3), dtype=jnp.uint8)
        pos = jnp.ones((5, 7, 3))
        out = tx.sample_sphere_texture(tex, pos)
        assert out.shape == (5, 7, 3)


class TestProcgen:
    def test_generation_channels_and_determinism(self):
        t1 = generate_earth_textures((64, 128), seed=3)
        t2 = generate_earth_textures((64, 128), seed=3)
        for k in ("albedo", "topography", "ocean", "clouds", "bathymetry", "emissive", "stars"):
            assert k in t1
            np.testing.assert_array_equal(t1[k], t2[k])
        assert t1["albedo"].shape == (64, 128, 3)
        assert t1["topography"].shape == (64, 128)
        assert t1["albedo"].dtype == np.uint8

    def test_land_fraction_reasonable(self):
        t = generate_earth_textures((128, 256), seed=7)
        ocean_frac = (t["ocean"] > 127).mean()
        assert 0.5 < ocean_frac < 0.8

    def test_atlas_loads(self, tmp_path):
        atlas = procedural_texture_atlas((32, 64), seed=1)
        assert atlas.albedo.shape == (32, 64, 3)
        assert atlas.stars.shape == (32, 64, 3)
