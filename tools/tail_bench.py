#!/usr/bin/env python
"""Micro-bench of the compacted tail stage: time run_bounces on a realistic
32K-lane wavefront under variant TraceConfigs, on the real TPU.

The tail stages are ~70% of a 1080p frame (stage-1 is ~2.4 s of ~8 s), and a
single all-alive 32K-lane 2-bounce call measures 618 ms device time
(tools/profile_trace.py), so this is the inner loop to optimize. The harness
builds the wavefront the same way profile_trace does — running stage 1 over
mid-frame tiles until one compact tile's worth of lanes survives — then times
the tail call alone.

Usage: python tools/tail_bench.py --variants base,march_floor2
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

APOLLO = {
    "pos": (35963490.23139822, 12765367.037276791, -42445899.29884433),
    "look": (23201393.603171505, 8394073.279136525, -26074562.13501193),
    "up": (0.26080361881808384, 0.6750209397555819, -0.6901653449014103),
    "fov": 0.12692034034212948,
    "sun_angle": 5.0813688841507325,
    "sun_path_rot": -1.7096024133386984,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base")
    ap.add_argument("--texture-res", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--bounces", type=int, default=2)
    args = ap.parse_args()

    from digital_earth_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from digital_earth_tpu.assets.textures import load_texture_atlas
    from digital_earth_tpu.ops import spectral as sp
    from digital_earth_tpu.render import pathtracer as pt
    from digital_earth_tpu.render.camera import cast_dirs
    from digital_earth_tpu.render.renderer import (
        Renderer, _compact_by_alive, _stage_bounds,
    )

    atlas = load_texture_atlas(
        procedural_resolution=(args.texture_res, 2 * args.texture_res)
    )
    r = Renderer(image_res=(1920, 1080), atlas=atlas, tile_pixels=2048)
    r.set_camera_pos(*APOLLO["pos"])
    r.set_look_at(*APOLLO["look"])
    r.set_up(*APOLLO["up"])
    r.set_fov(APOLLO["fov"])
    r.set_sun_angle(APOLLO["sun_angle"])
    r.set_sun_path_rot(APOLLO["sun_path_rot"])

    cam, scene, luts, cfg0 = (
        r._camera_params(), r._scene_params(), r.luts, r.cfg,
    )
    image_res, (bw, bh) = r.image_res, r.block
    tile = bw * bh
    w, h = image_res
    nbx, nby = w // bw, h // bh
    n_tiles = nbx * nby
    stages = _stage_bounds(cfg0)
    key = jax.random.PRNGKey(7)

    def stage1_tile(tkey, tile_idx, cfg):
        tile_idx = jnp.asarray(tile_idx, jnp.int32)
        k_u, k_v, k_wl, k_tr = jax.random.split(tkey, 4)
        bx = tile_idx // nby
        by = tile_idx % nby
        lane = jnp.arange(tile)
        pu = (bx * bw + lane // bh).astype(jnp.float32)
        pv = (by * bh + lane % bh).astype(jnp.float32)
        dirs = cast_dirs(
            cam, pu, pv, jax.random.uniform(k_u, (tile,)),
            jax.random.uniform(k_v, (tile,)), image_res,
        )
        pos = jnp.broadcast_to(cam.position, (tile, 3))
        u = jax.random.uniform(k_wl, (tile,))
        wl, resp, lpdf = sp.spectrum_sample_hero(
            u, luts.cie_cdf, luts.cie_response, cfg.hero_lambdas
        )
        st = pt.init_state(pos, dirs, wl, lpdf, rng_keys=k_tr)
        return pt.run_bounces(st, scene, atlas, luts, cfg, 0, stages[1])

    def build_tail_state(cfg):
        s1 = jax.jit(lambda k, i: stage1_tile(k, i, cfg))
        sts = []
        for i in range(n_tiles // 8, n_tiles, max(1, n_tiles // 64)):
            sts.append(s1(jax.random.fold_in(key, i), i))
            if sum(int(s.alive.sum()) for s in sts) >= cfg.compact_tile:
                break
        st = jax.tree_util.tree_map(lambda *a: jnp.concatenate(a, 0), *sts)
        (st, _), _ = _compact_by_alive(
            (st, jnp.zeros_like(st.alive)), st.alive, st.work_class
        )
        st = jax.tree_util.tree_map(lambda a: a[: cfg.compact_tile], st)
        return jax.block_until_ready(st)

    base = build_tail_state(cfg0)
    print(
        f"tail tile: {int(base.alive.sum())}/{cfg0.compact_tile} alive, "
        f"classes {[int((base.work_class[base.alive] == c).sum()) for c in range(3)]}",
        flush=True,
    )

    variants = {
        "base": {},
        "march125": {"land_march_steps": 125},
        "k8": {"tracking_k": 8},
        "march_k8": {"march_k": 8},
        "flight_on": {"analytic_flight": True},
    }

    for name in args.variants.split(","):
        over = variants[name] if name in variants else eval(f"dict({name})")
        cfg = dataclasses.replace(cfg0, **over)
        tail = jax.jit(
            lambda k, s, cfg=cfg: pt.run_bounces(
                s, scene, atlas, luts, cfg,
                jnp.asarray(stages[1], jnp.int32),
                jnp.asarray(stages[1] + args.bounces, jnp.int32),
            )
        )
        out = jax.block_until_ready(tail(key, base))
        t0 = time.time()
        for _ in range(args.reps):
            out = tail(key, base)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / args.reps * 1e3
        print(f"{name:24s} {dt:8.1f} ms/call  "
              f"(alive out: {int(out.alive.sum())})", flush=True)


if __name__ == "__main__":
    main()
