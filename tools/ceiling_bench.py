#!/usr/bin/env python
"""Measure the quantities the PERFORMANCE.md ceiling arithmetic needs:

1. ns per 128-lane row gather of the packed texture atlas (the march/
   tracking tap cost), measured in a compiled loop at wavefront width;
2. per-bounce inner-loop trip counts on a real Apollo wavefront (march,
   cloud tracking, NEE ratio track), by swapping lax.while_loop for a
   counting scan inside ONE bounce body;
3. mean path length (bounces) on the Apollo frame.

Together: paths/s ceiling = 1 / (bounces x (sum_loop iters x taps/iter)
x tap_cost + fixed VPU work), printed as a table.
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
    ap.add_argument("--texture-res", type=int, default=1024)
    ap.add_argument("--n", type=int, default=32768)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    args = ap.parse_args()

    from digital_earth_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from digital_earth_tpu.assets.textures import load_texture_atlas
    from digital_earth_tpu.ops import texture as tx
    from digital_earth_tpu.render import pathtracer as pt
    from digital_earth_tpu.render import renderer as rd
    from digital_earth_tpu.render.params import TraceConfig
    from digital_earth_tpu import constants as C

    atlas = load_texture_atlas(
        procedural_resolution=(args.texture_res, 2 * args.texture_res)
    )
    cfg = TraceConfig()
    n = args.n

    # ---- 1. row-gather cost at wavefront width -------------------------
    key = jax.random.PRNGKey(0)
    pos = jax.random.normal(key, (n, 3))
    pos = pos / jnp.linalg.norm(pos, axis=-1, keepdims=True) * (
        C.PLANET_R + 5e3
    )

    @jax.jit
    def gather_loop(pos, reps):
        def body(i, acc):
            # perturb so each iteration gathers fresh rows (defeats CSE)
            p = pos * (1.0 + 1e-7 * i.astype(jnp.float32))
            s = tx.sample_sphere_texture(atlas.clouds, p, bilinear=False)
            return acc + jnp.sum(s, axis=-1)

        return jax.lax.fori_loop(0, reps, body, jnp.zeros((n,)))

    reps = 256
    gather_loop(pos, 2).block_until_ready()  # compile
    t0 = time.time()
    gather_loop(pos, reps).block_until_ready()
    dt = time.time() - t0
    rows = n / 128 * reps
    tap_ns = dt / (n * reps) * 1e9
    row_ns = dt / rows * 1e9
    print(f"gather: {tap_ns:.3f} ns/lane-tap, {row_ns:.1f} ns/128-lane row "
          f"({n} lanes x {reps} reps, 4-channel clouds texture)")

    # ---- 2+3. loop trip counts + path length on a real wavefront -------
    # Build the post-stage-1 wavefront exactly as the renderer does.
    w, h = args.width, args.height
    block = rd._pick_block_dims(w, h, 2048)
    from digital_earth_tpu.render.camera import make_camera_params
    from digital_earth_tpu.render.params import make_scene_params
    from digital_earth_tpu.assets.luts import load_spectral_luts

    luts = load_spectral_luts()
    cam = make_camera_params(
        position=APOLLO["pos"], look_at=APOLLO["look"], up=APOLLO["up"],
        fov=APOLLO["fov"],
    )
    scene = make_scene_params(APOLLO["sun_angle"], APOLLO["sun_path_rot"], 7800.0)

    # count while-loop trips inside run_bounces by recording scans, one
    # bounce at a time over the live wavefront
    counters = []
    orig_while = jax.lax.while_loop

    def counting_while(cond, body, init):
        # fixed-length scan with a live flag; records total live iterations
        slot = len(counters)

        def sbody(s, _):
            run = cond(s)
            s2 = body(s)
            s_next = jax.tree_util.tree_map(
                lambda a, b: jnp.where(run, b, a), s, s2
            )
            return s_next, run

        # generous static budget: trackers cap at max_tracking_steps but in
        # practice finish in tens of iterations; 512 records the true count
        final, ran = jax.lax.scan(sbody, init, None, length=512)
        counters.append(ran)
        return final

    base_key = jax.random.PRNGKey(7)
    n_tiles = (w // block[0]) * (h // block[1])

    # eager lax.cond: branch predicates are concrete outside jit, so
    # dispatch directly — otherwise cond TRACES both branches and the
    # counting_while records tracers instead of concrete trip masks
    orig_cond = jax.lax.cond

    def eager_cond(pred, true_fn, false_fn, *ops):
        return true_fn(*ops) if bool(pred) else false_fn(*ops)

    # one stage-1 tile's state, then one full tail bounce with counting
    tile = block[0] * block[1]
    from digital_earth_tpu.ops import rng as rngmod
    from digital_earth_tpu.ops import spectral as sp

    spp_key = jax.random.fold_in(base_key, 0)
    # mid-frame tile (earth disk)
    tidx = n_tiles // 2 + (w // block[0]) // 2
    nby = h // block[1]
    bx, by = tidx // nby, tidx % nby
    lane = jnp.arange(tile)
    pu_i = bx * block[0] + lane // block[1]
    pv_i = by * block[1] + lane % block[1]
    pid = pu_i * h + pv_i
    lkeys = rngmod.lane_keys(spp_key, pid)
    from digital_earth_tpu.render.camera import cast_dirs
    u_jit = rngmod.uniform(rngmod.fold(lkeys, 101), (2,))
    u = rngmod.uniform(rngmod.fold(lkeys, 102))
    dirs = cast_dirs(cam, pu_i.astype(jnp.float32), pv_i.astype(jnp.float32),
                     u_jit[0], u_jit[1], (w, h))
    pos0 = jnp.broadcast_to(cam.position, (tile, 3))
    wl, resp, lpdf = sp.spectrum_sample_hero(
        u, luts.cie_cdf, luts.cie_response, cfg.hero_lambdas
    )
    st = pt.init_state(pos0, dirs, wl, lpdf, rng_keys=lkeys)

    jax.lax.while_loop = counting_while
    jax.lax.cond = eager_cond
    try:
        stf = pt.run_bounces(st, scene, atlas, luts, cfg, 0, 1, unroll=1)
        trips = jax.device_get([c for c in counters])
    finally:
        jax.lax.while_loop = orig_while
        jax.lax.cond = orig_cond

    names = ["march?", "cloud_delta?", "nee_cloud_ratio?"]
    print(f"\nbounce-0 inner loops on a {tile}-lane earth-disk tile "
          f"(order of appearance in run_bounces):")
    for i, tr in enumerate(trips):
        tr = np.asarray(tr)
        print(f"  while#{i}: {int(tr.sum())} live iterations "
              f"(first dead at {int(np.argmin(tr)) if not tr.all() else -1})")

    # ---- 3. mean path length -------------------------------------------
    alive_per_bounce = []
    stb = st
    for b in range(cfg.max_bounces):
        stb = pt.run_bounces(stb, scene, atlas, luts, cfg, b, b + 1, unroll=1)
        alive_per_bounce.append(int(jnp.sum(stb.alive)))
        if alive_per_bounce[-1] == 0:
            break
    total = tile + sum(alive_per_bounce[:-1])
    print(f"\nalive after each bounce (of {tile}): {alive_per_bounce}")
    print(f"mean path length: {total / tile:.2f} bounces")


if __name__ == "__main__":
    main()
