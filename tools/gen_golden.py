#!/usr/bin/env python
"""Regenerate the golden render tensors under tests/golden/.

Goldens are tiny fixed-seed CPU renders (SURVEY.md §4: golden-image
integration tests). Regenerate only when an *intentional* change to the
estimator/scene defaults changes the image; CI compares bit-near-exactly on
the CPU backend.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden"
)


def build_renderer(mode="path"):
    from digital_earth_tpu.assets.procgen import generate_earth_textures
    from digital_earth_tpu.assets.textures import build_atlas
    from digital_earth_tpu.render.params import TraceConfig
    from digital_earth_tpu.render.renderer import Renderer

    atlas = build_atlas(generate_earth_textures((64, 128), seed=3))
    cfg = TraceConfig(max_bounces=3, land_march_steps=64, max_tracking_steps=256)
    r = Renderer(
        image_res=(32, 18), atlas=atlas, tile_pixels=576, seed=0, cfg=cfg, mode=mode
    )
    # Apollo 11 pose (scenes/config - Apollo 11.txt)
    r.set_camera_pos(35963490.23139822, 12765367.037276791, -42445899.29884433)
    r.set_look_at(23201393.603171505, 8394073.279136525, -26074562.13501193)
    r.set_up(0.26080361881808384, 0.6750209397555819, -0.6901653449014103)
    r.set_fov(0.12692034034212948)
    r.set_sun_angle(5.0813688841507325)
    r.set_sun_path_rot(-1.7096024133386984)
    return r


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for mode, spp in (("path", 2), ("preview", 1)):
        r = build_renderer(mode)
        for _ in range(spp):
            r.accumulate()
        buf = np.asarray(r.color_buffer)
        img = np.asarray(r.fetch_image())
        np.savez_compressed(
            os.path.join(GOLDEN_DIR, f"apollo_{mode}.npz"),
            color_buffer=buf,
            image=img,
            spp=spp,
        )
        print(f"wrote apollo_{mode}.npz buf-mean={buf.mean():.6e} img-mean={img.mean():.4f}")


if __name__ == "__main__":
    main()
