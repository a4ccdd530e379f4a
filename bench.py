#!/usr/bin/env python
"""Benchmark: paths/sec on the Apollo-11 scene at 1080p (BASELINE.json metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Baseline proxy: the reference (Taichi/Vulkan on an RTX 3070) publishes no
numbers (BASELINE.md); its commented-out adaptive-spp controller targeted
30 FPS at 1 spp / 1920x1080 (reference earth_viewer.py:13,253-257), i.e.
1920*1080*30 = 62.2M paths/s. vs_baseline is measured paths/s divided by
that proxy.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REFERENCE_PATHS_PER_SEC = 1920 * 1080 * 30  # 30 FPS x 1spp x 1080p proxy


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--spp", type=int, default=2, help="timed spp after warmup")
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument(
        "--texture-res", type=int, default=10800,
        help="procedural texture height for the HEADLINE number; the default "
        "10800 is the reference's tier-2 21600x10800 scale (reference "
        "lib/textures.py:1,65-79) — the reference's default experience, so "
        "the honest number to report (VERDICT r2 item 3)",
    )
    ap.add_argument(
        "--lowres-texture-res", type=int, default=1024,
        help="secondary measurement at reduced texture scale (0 disables); "
        "recorded as paths_per_sec_lowres for round-over-round continuity "
        "with BENCH_r01/r02",
    )
    ap.add_argument("--out", default=None, help="optionally save the frame PNG")
    args = ap.parse_args()

    import jax

    from digital_earth_tpu.assets.textures import load_texture_atlas
    from digital_earth_tpu.render.renderer import Renderer
    from digital_earth_tpu.utils.cache import enable_compilation_cache

    if os.environ.get("DE_FORCE_CPU"):
        # local smoke runs; config.update wins over the TPU plugin's env,
        # and must land before anything initializes the backend (the
        # compilation-cache signature reads jax.default_backend())
        jax.config.update("jax_platforms", "cpu")
    enable_compilation_cache()

    def measure(texture_res):
        """(paths/s, s/spp, warmup_s, hero_lambdas) at one texture scale."""
        atlas = load_texture_atlas(
            procedural_resolution=(texture_res, 2 * texture_res)
        )
        r = Renderer(
            image_res=(args.width, args.height), atlas=atlas,
            tile_pixels=args.tile,
        )
        # Apollo 11 scene ("config - Apollo 11.txt")
        r.set_camera_pos(
            35963490.23139822, 12765367.037276791, -42445899.29884433
        )
        r.set_look_at(
            23201393.603171505, 8394073.279136525, -26074562.13501193
        )
        r.set_up(
            0.26080361881808384, 0.6750209397555819, -0.6901653449014103
        )
        r.set_fov(0.12692034034212948)
        r.set_aspect_scale(0.996999979019165)
        r.set_exposure(2.431999921798706)
        r.set_crf(12)
        r.set_gamma(1.0010000467300415)
        r.set_sun_angle(5.0813688841507325)
        r.set_sun_path_rot(-1.7096024133386984)

        # warmup (compile + first spp)
        t0 = time.time()
        r.accumulate()
        r.color_buffer.block_until_ready()
        warmup_s = time.time() - t0

        t0 = time.time()
        for _ in range(args.spp):
            r.accumulate()
        r.color_buffer.block_until_ready()
        dt = time.time() - t0
        if args.out and texture_res == args.texture_res:
            from PIL import Image

            Image.fromarray(r.fetch_image_np()).save(args.out)
        pps = args.width * args.height * args.spp / dt
        return pps, dt / args.spp, warmup_s, r.cfg.hero_lambdas

    paths_per_sec, s_per_spp, warmup_s, hero_l = measure(args.texture_res)
    result = {
        "metric": "paths_per_sec_1080p_apollo11_tier2",
        "value": round(paths_per_sec, 1),
        "unit": "paths/s/chip",
        "vs_baseline": round(paths_per_sec / REFERENCE_PATHS_PER_SEC, 6),
        "device": str(jax.devices()[0]),
        "resolution": [args.width, args.height],
        "spp_timed": args.spp,
        "texture_res": [2 * args.texture_res, args.texture_res],
        "seconds_per_spp": round(s_per_spp, 3),
        "warmup_s": round(warmup_s, 1),
        "hero_lambdas": hero_l,
        "spectral_samples_per_sec": round(paths_per_sec * hero_l, 1),
        "est_wallclock_1024spp_s": round(1024 * s_per_spp, 1),
    }
    if args.lowres_texture_res:
        pps_lo, spspp_lo, warm_lo, _ = measure(args.lowres_texture_res)
        result.update(
            paths_per_sec_lowres=round(pps_lo, 1),
            lowres_texture_res=[
                2 * args.lowres_texture_res, args.lowres_texture_res
            ],
            lowres_seconds_per_spp=round(spspp_lo, 3),
            lowres_warmup_s=round(warm_lo, 1),
        )
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
