#!/usr/bin/env python
"""Instrument the land-march loop: per-iteration done-fraction and the
per-lane probe-count histogram on a realistic tail-stage wavefront, plus
sensitivity of the hit results to the probe budget. Diagnoses the
worst-lane tail that paces every march while_loop.

NOTE: this replicates a FROZEN round-2 copy of the loop (no stall
termination, tight-mip skip, or exact ocean hit), kept for budget-
sensitivity archaeology. For the production loop's real iteration curve
use tools/march_diag.py, which records intersect_land itself."""

import argparse
import os
import sys

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
    args = ap.parse_args()

    from digital_earth_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from digital_earth_tpu import constants as C
    from digital_earth_tpu.assets.textures import load_texture_atlas
    from digital_earth_tpu.ops import math_utils as mu
    from digital_earth_tpu.ops import texture as tx
    from digital_earth_tpu.render import pathtracer as pt
    from digital_earth_tpu.render.params import TraceConfig

    atlas = load_texture_atlas(
        procedural_resolution=(args.texture_res, 2 * args.texture_res)
    )
    cfg = TraceConfig()
    topo = atlas.topography
    scale = jnp.float32(7800.0)

    # Build a mixed primary+secondary ray population: camera rays toward the
    # planet plus near-surface hemisphere bounce rays (the tail-stage mix).
    rng = np.random.default_rng(0)
    n = args.n
    cam = np.asarray(APOLLO["pos"])
    look = np.asarray(APOLLO["look"])
    fwd = (look - cam) / np.linalg.norm(look - cam)
    up = np.asarray(APOLLO["up"])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    vup = np.cross(right, fwd)
    half = args.n // 2
    uv = (rng.random((half, 2)) - 0.5) * APOLLO["fov"]
    dirs_cam = fwd[None] + uv[:, :1] * right[None] + uv[:, 1:] * vup[None]
    dirs_cam /= np.linalg.norm(dirs_cam, axis=-1, keepdims=True)
    pos_cam = np.broadcast_to(cam, (half, 3))
    # secondary: points near the surface, cosine-ish upward directions
    u = rng.normal(size=(n - half, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    pos_srf = u * (C.PLANET_R + rng.random((n - half, 1)) * 30e3)
    d = rng.normal(size=(n - half, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    flip = np.sum(d * u, axis=-1) < 0.0
    d[flip] -= 2 * np.sum(d[flip] * u[flip], axis=-1, keepdims=True) * u[flip]
    pos = jnp.asarray(np.concatenate([pos_cam, pos_srf]), jnp.float32)
    dirs = jnp.asarray(np.concatenate([dirs_cam, d]), jnp.float32)
    active = jnp.ones((n,), bool)

    # --- replicate intersect_land's loop, recording done-fraction ---------
    import math

    k = cfg.march_k
    arange_k = jnp.arange(k)[:, None].astype(jnp.float32)
    step_floor = math.pi * C.PLANET_R / topo.w * 0.25

    bound_near, bound_far = mu.rsi(pos, dirs, C.PLANET_R + scale)
    may_hit = active & (bound_far > 0.0)
    t0 = jnp.maximum(bound_near, 0.0)
    max_ray_dist = C.PLANET_R * 10.0
    miss_beyond = jnp.minimum(bound_far + 1.0, max_ray_dist)

    def body(s, _):
        i, t, stride, done, missed = s
        ts = t[None, :] + arange_k * stride[None, :]
        ro = pos[None] + ts[..., None] * dirs[None]
        sample = tx.sample_sphere_texture(topo, ro, bilinear=cfg.bilinear_tracking)
        f = mu.length(ro) - C.PLANET_R - scale * sample[..., 0]

        def regional_skip(mip_val, valid):
            r_bound = C.PLANET_R + scale * mip_val
            b_near, b_far = mu.rsi(ro, dirs, r_bound)
            return jnp.where(
                b_near > 0.0,
                jnp.minimum(b_near, valid),
                jnp.where(b_far < 0.0, valid, 0.0),
            )

        s_region = jnp.maximum(
            regional_skip(sample[..., 1], pt._MIP_VALID_FINE),
            regional_skip(sample[..., 2], pt._MIP_VALID_COARSE),
        )
        step = jnp.where(
            f < 0.0, f, jnp.maximum(jnp.maximum(f, s_region), step_floor)
        )
        converged = jnp.abs(f) < ts * 1e-4
        out = ts > miss_beyond[None, :]
        terminal = converged | out
        stop_k = terminal | (step < stride[None, :])
        any_stop = jnp.any(stop_k, axis=0)
        first = jnp.argmax(stop_k, axis=0)
        pick = (arange_k == first[None, :].astype(jnp.float32)).astype(step.dtype)
        psel = lambda a: jnp.sum(a * pick, axis=0)
        t_stop = psel(ts)
        step_stop = psel(step)
        conv_stop = psel(converged.astype(step.dtype)) > 0.5
        out_stop = psel(out.astype(step.dtype)) > 0.5
        t_stopped = jnp.where(conv_stop | out_stop, t_stop, t_stop + step_stop)
        t_full = ts[-1] + step[-1]
        t_new = jnp.where(any_stop, t_stopped, t_full)
        applied = jnp.where(any_stop, step_stop, step[-1])
        stride_new = jnp.maximum(applied, step_floor)
        newly_done = any_stop & (conv_stop | out_stop)
        missed = missed | ((~done) & any_stop & out_stop & ~conv_stop)
        t = jnp.where(done, t, jnp.where(newly_done, t_stop, t_new))
        stride = jnp.where(done | newly_done, stride, stride_new)
        done = done | newly_done
        return (i + k, t, stride, done, missed), jnp.sum(~done)

    n_iters = cfg.land_march_steps // k
    init = (0, t0, jnp.full((n,), step_floor), ~may_hit, ~may_hit)
    run = jax.jit(lambda: jax.lax.scan(body, init, None, length=n_iters))
    (_, t, _, done, missed), undone = run()
    undone = np.asarray(undone)
    print(f"lanes: {n}, may_hit: {int(jnp.sum(may_hit))}")
    print("iteration -> lanes still marching (of may_hit):")
    marks = [1, 2, 4, 8, 12, 16, 20, 24, 28, 32, 40, 48, 56, 62]
    for m in marks:
        if m <= len(undone):
            print(f"  iter {m:3d} ({m*k:4d} probes): {int(undone[m-1]):6d}")
    # budget sensitivity: hits/misses and hit-t agreement vs the full budget
    t_full, missed_full = np.asarray(t), np.asarray(missed)
    hit_full = (~missed_full) & (t_full < C.PLANET_R * 10.0) & np.asarray(may_hit)
    for budget_iters in (16, 24, 32, 48):
        init2 = (0, t0, jnp.full((n,), step_floor), ~may_hit, ~may_hit)
        run2 = jax.jit(
            lambda ii=budget_iters: jax.lax.scan(body, init2, None, length=ii)
        )
        (_, t2, _, _, missed2), _ = run2()
        t2, missed2 = np.asarray(t2), np.asarray(missed2)
        hit2 = (~missed2) & (t2 < C.PLANET_R * 10.0) & np.asarray(may_hit)
        flips = int(np.sum(hit2 != hit_full))
        both = hit2 & hit_full
        dt = np.abs(t2[both] - t_full[both])
        rel = dt / np.maximum(t_full[both], 1.0)
        print(
            f"budget {budget_iters*k:4d} probes: hit flips {flips:5d} "
            f"({100.0*flips/max(int(hit_full.sum()),1):.2f}% of hits), "
            f"hit-t rel err p50/p99/max = "
            f"{np.percentile(rel,50):.2e}/{np.percentile(rel,99):.2e}/{rel.max():.2e}"
        )


if __name__ == "__main__":
    main()
