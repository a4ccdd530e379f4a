#!/usr/bin/env python
"""Image-level fidelity A/B: accelerated trackers vs the reference-faithful
naive trackers (render/tracking_naive.py), with statistical power.

The BASELINE gate is "per-channel error <1% at 1024 spp vs the Taichi
reference". Taichi is not installable here and the reference's NASA textures
are not in its repo, so the measurable proxy is accelerated vs
``naive_tracking=True`` on identical scenes/LUTs/textures: the naive trackers
reproduce the reference's estimators step for step (global sea-level
majorants, one-step Woodcock/ratio loops, plain sphere march), so any bias the
accelerated path (analytic flights, local majorants, band skips, march
skips/stall cuts) introduces shows up as a difference of converged means.

Statistical design (VERDICT r2 "missing" #1: the r2 A/B at 160 spp had a 2.40
diff on a 2.20 noise floor — zero power):

- Both arms run ``--batches`` independent-seed renders of ``--spp`` samples
  each; the batch-to-batch scatter of per-batch means gives an *empirical*
  standard error for every statistic we report — no variance model needed.
- Headline: per-channel relative error of the frame mean,
  err_c = (mean_acc - mean_naive)/mean_naive, with its propagated SE.
  Frame means pool W*H*spp*batches samples, so the floor shrinks ~1/sqrt of
  the full sample budget — sub-0.1%% floors are cheap at 320x180.
- Spatial check (frame means can hide sign-canceling local bias): the frame
  is cut into ``--block`` x ``--block`` pixel blocks; per block the relative
  difference and its SE are computed, and we report the distribution of
  z = diff/SE over blocks. If the accelerated path were locally biased
  anywhere, |z| inflates beyond the standard normal (median |z| ~ 0.67,
  p95 ~ 1.96 under H0: no bias).

Both arms use hero_lambdas=1 (the naive trackers are single-wavelength), so
this isolates the trackers — the hero-packet estimator is validated
separately (tests/test_spectral.py MIS identities + 3-scene goldens).

Progress is checkpointed per batch to --state; rerunning resumes, so a
long run can be interrupted at any point and still report.

Usage:
  python tools/parity_ab.py --scene apollo --spp 256 --batches 8
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENES = {
    "apollo": "config - Apollo 11.txt",
    "florida": "config - florida.txt",
    "sunset": "config - sunset hurricane.txt",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="apollo", choices=list(SCENES))
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=180)
    ap.add_argument("--texture-res", type=int, default=1024)
    ap.add_argument("--spp", type=int, default=256, help="spp per seed batch")
    ap.add_argument("--batches", type=int, default=8, help="seed batches/arm")
    ap.add_argument("--block", type=int, default=20, help="block size (px)")
    ap.add_argument(
        "--exclude-top-pct", type=float, default=0.5,
        help="exclude this percent of brightest pixels (by the COMBINED "
        "mean of both arms — symmetric, so zero-mean under H0) from the "
        "frame-mean metric; sun-glint fireflies otherwise dominate the "
        "frame mean's variance and destroy the test's power. The raw "
        "(no-exclusion) numbers are reported alongside.",
    )
    ap.add_argument("--state", default=None, help="checkpoint npz path")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()
    state_path = args.state or os.path.join(
        ROOT, f"parity_state_{args.scene}_{args.spp}spp.npz"
    )

    from digital_earth_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if os.environ.get("DE_FORCE_CPU"):
        # the env var route is overridden by the TPU plugin's registration;
        # config.update wins (tests/conftest.py documents the trap)
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from digital_earth_tpu.app.config_io import apply_config, load_config
    from digital_earth_tpu.assets.textures import load_texture_atlas
    from digital_earth_tpu.render.params import TraceConfig
    from digital_earth_tpu.render.renderer import Renderer

    atlas = load_texture_atlas(
        procedural_resolution=(args.texture_res, 2 * args.texture_res)
    )
    config = load_config(os.path.join(ROOT, "scenes", SCENES[args.scene]))
    cfgs = {
        "accel": dataclasses.replace(TraceConfig(), hero_lambdas=1),
        "naive": dataclasses.replace(
            TraceConfig(), hero_lambdas=1, naive_tracking=True
        ),
    }

    # resumable per-batch frame store: {arm}_{batch} -> (W, H, 3) mean frame
    store = {}
    if os.path.exists(state_path):
        with np.load(state_path) as z:
            store = {k: z[k] for k in z.files}
        print(f"resumed {len(store)} batches from {state_path}", flush=True)

    for arm, cfg in cfgs.items():
        for b in range(args.batches):
            key = f"{arm}_{b}"
            if key in store:
                continue
            t0 = time.time()
            r = Renderer(
                image_res=(args.width, args.height), atlas=atlas,
                tile_pixels=2048, seed=1000 * (b + 1) + (arm == "naive"),
                cfg=cfg,
            )
            apply_config(r, config)
            for _ in range(args.spp):
                r.accumulate()
            r.color_buffer.block_until_ready()
            store[key] = np.asarray(r.color_buffer) / args.spp
            tmp = state_path + ".tmp.npz"  # savez appends .npz otherwise
            np.savez_compressed(tmp, **store)
            os.replace(tmp, state_path)
            print(
                f"{key}: {args.spp} spp in {time.time()-t0:.1f}s "
                f"({args.width*args.height*args.spp/(time.time()-t0):.0f} "
                "paths/s)",
                flush=True,
            )

    A = np.stack([store[f"accel_{b}"] for b in range(args.batches)])
    N = np.stack([store[f"naive_{b}"] for b in range(args.batches)])
    B = args.batches

    # headline: per-channel relative error of the frame mean + SE.
    # |mu_n| in denominators: single-wavelength XYZ->RGB samples are signed
    # (a saturated-λ firefly can push a barely-sampled channel negative), so
    # the convergence-relative scale is the magnitude.
    def frame_stats(keep):
        am = A[:, keep].mean(axis=1)  # (B, 3) per-batch frame means
        nm = N[:, keep].mean(axis=1)
        mu_a, mu_n = am.mean(0), nm.mean(0)
        se = np.sqrt(am.var(0, ddof=1) / B + nm.var(0, ddof=1) / B)
        return (mu_a - mu_n) / np.abs(mu_n), se / np.abs(mu_n)

    all_px = np.ones(A.shape[1:3], bool)
    rel_err_raw, rel_floor_raw = frame_stats(all_px)
    comb = 0.5 * (np.abs(A).mean(axis=(0, 3)) + np.abs(N).mean(axis=(0, 3)))
    if args.exclude_top_pct > 0:
        keep = comb <= np.percentile(comb, 100 - args.exclude_top_pct)
    else:
        keep = all_px
    rel_err, rel_floor = frame_stats(keep)

    # spatial z-scores over blocks; relative diffs are luminance-relative
    # (per-channel block means can sit near zero)
    bs = args.block
    W, H = args.width, args.height
    bw, bh = W // bs, H // bs
    blk = lambda F: F[:, : bw * bs, : bh * bs].reshape(
        B, bw, bs, bh, bs, 3
    ).mean(axis=(2, 4))  # (B, bw, bh, 3)
    Ab, Nb = blk(A), blk(N)
    d = Ab.mean(0) - Nb.mean(0)
    se_b = np.sqrt(Ab.var(0, ddof=1) / B + Nb.var(0, ddof=1) / B)
    lum = np.abs(Nb.mean(0)).mean(-1, keepdims=True)
    lit = np.broadcast_to(lum > np.percentile(lum, 25), d.shape)
    z = d[lit] / np.maximum(se_b[lit], 1e-12)
    rel_blk = np.abs(d[lit]) / np.broadcast_to(
        np.maximum(lum, 1e-12), d.shape
    )[lit]

    result = {
        "scene": args.scene,
        "resolution": [W, H],
        "spp_per_batch": args.spp,
        "batches": B,
        "total_spp_per_arm": args.spp * B,
        "rel_err_pct": [round(100 * float(x), 4) for x in rel_err],
        "noise_floor_pct": [round(100 * float(x), 4) for x in rel_floor],
        "excluded_top_pct": args.exclude_top_pct,
        "rel_err_raw_pct": [round(100 * float(x), 4) for x in rel_err_raw],
        "noise_floor_raw_pct": [
            round(100 * float(x), 4) for x in rel_floor_raw
        ],
        "block_abs_z_median": round(float(np.median(np.abs(z))), 3),
        "block_abs_z_p95": round(float(np.percentile(np.abs(z), 95)), 3),
        "block_abs_z_expected_h0": [0.674, 1.96],
        "block_rel_diff_median_pct": round(100 * float(np.median(rel_blk)), 4),
        "block_rel_diff_p95_pct": round(
            100 * float(np.percentile(rel_blk, 95)), 4
        ),
    }
    print(json.dumps(result, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
