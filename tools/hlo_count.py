#!/usr/bin/env python
"""Count compiled-HLO instructions inside the hot while-loop bodies.

The round-4 ceiling model (docs/PERFORMANCE.md) says a tracking/march loop
iteration's cost is (number of emitted fusion/gather groups) x (fixed
pipeline latency), NOT elementwise op count — so the fusion-group diet
(VERDICT r4 item 3) needs an instrument that counts what XLA actually emits
per iteration. This compiles each hot loop in isolation at production lane
width and reports, for every while-loop body in the optimized module:
top-level instruction count by opcode class (fusion kinds, gathers,
converts, RNG), plus the total leaf-op count inside fusions.

Usage: python tools/hlo_count.py [--n 1920] [--loop march|cloud|rmo|ratio|all]
"""

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def body_histogram(hlo_text):
    """Per while-body opcode histograms from optimized HLO text."""
    # computations look like: "%name (param: ...) -> type {" ... "}"
    comps = {}
    cur = None
    for line in hlo_text.splitlines():
        m = re.match(r"\s*%?([\w\.\-]+)\s+\([^)]*\)\s+->\s+.*{", line)
        if m:
            cur = m.group(1)
            comps[cur] = []
        elif cur is not None:
            if line.strip() == "}":
                cur = None
            else:
                comps[cur].append(line)
    # find computations referenced as while bodies
    bodies = set()
    for lines in comps.values():
        for ln in lines:
            m = re.search(r"while\(.*body=%?([\w\.\-]+)", ln)
            if m:
                bodies.add(m.group(1))
            m = re.search(r"body=%?([\w\.\-]+)", ln)
            if m and "while" in ln:
                bodies.add(m.group(1))
    out = {}
    for b in bodies:
        if b not in comps:
            continue
        hist = collections.Counter()
        fusion_leaf_ops = 0
        for ln in comps[b]:
            ln = ln.strip()
            m = re.match(r"%?[\w\.\-]+\s*=\s*[\w\[\],\s{}/*]+?\s(\w+)\(", ln)
            if not m:
                continue
            op = m.group(1)
            if op == "fusion":
                km = re.search(r"kind=(\w+)", ln)
                kind = km.group(1) if km else "?"
                hist[f"fusion.{kind}"] += 1
                cm = re.search(r"calls=%?([\w\.\-]+)", ln)
                if cm and cm.group(1) in comps:
                    fusion_leaf_ops += sum(
                        1 for l2 in comps[cm.group(1)]
                        if re.match(r"\s*%?[\w\.\-]+\s*=", l2)
                    )
            else:
                hist[op] += 1
        out[b] = (hist, fusion_leaf_ops)
    return out


def report(name, fn, args):
    import jax

    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"\n=== {name} ===")
    for body, (hist, leaf) in sorted(body_histogram(txt).items()):
        total = sum(hist.values())
        print(f"  while-body {body}: {total} top-level ops, "
              f"{leaf} leaf ops in fusions")
        for op, cnt in hist.most_common():
            print(f"    {op:28s} {cnt}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1920)
    ap.add_argument("--loop", default="all")
    ap.add_argument("--tex", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from digital_earth_tpu.assets.textures import procedural_texture_atlas
    from digital_earth_tpu.render import pathtracer as pt
    from digital_earth_tpu.render.params import TraceConfig
    from digital_earth_tpu.models import volume as vol
    from digital_earth_tpu.ops import rng

    n = args.n
    cfg = TraceConfig()
    atlas = procedural_texture_atlas((args.tex, 2 * args.tex))
    key = jax.random.PRNGKey(0)
    keys = rng.as_lane_keys(key, n)
    # limb-ish rays from 400 km altitude, grazing
    pos = jnp.tile(jnp.array([[0.0, 6771e3, 0.0]]), (n, 1))
    d = jnp.array([[0.9, -0.43, 0.0]])
    d = d / jnp.linalg.norm(d)
    dirs = jnp.tile(d, (n, 1))
    scale = jnp.float32(7800.0)
    active = jnp.ones((n,), bool)
    L = cfg.hero_lambdas
    wl = jnp.linspace(400.0, 700.0, L)[None, :].repeat(n, 0)
    ext = jnp.stack(
        [
            vol.spectra_extinction_rayleigh(wl),
            vol.spectra_extinction_mie(wl),
            jnp.zeros_like(wl),
        ],
        axis=-1,
    )
    max_ext = jnp.max(jnp.sum(ext * pt._MAX_DENS_RMO, axis=-1), axis=-1)
    ext_w = jnp.full((n,), 0.1)
    max_ext_c = ext_w * 0.029
    t0 = jnp.zeros((n,))
    t1 = jnp.full((n,), 2.0e6)

    want = args.loop
    if want in ("march", "all"):
        report(
            "march (intersect_land)",
            lambda p, dd, a: pt.intersect_land(
                atlas.topography, p, dd, scale, a, cfg
            ),
            (pos, dirs, active),
        )
    if want in ("cloud", "all"):
        report(
            "cloud delta track",
            lambda k, p, dd, a, e: pt._track_cloud(
                k, p, dd, t0, t1, e, max_ext_c, atlas.clouds, a, cfg,
                mode="delta",
            ),
            (keys, pos, dirs, active, ext_w),
        )
    if want in ("ratio", "all"):
        report(
            "cloud ratio track (NEE)",
            lambda k, p, dd, a, e: pt._track_cloud(
                k, p, dd, t0, t1, e, max_ext_c, atlas.clouds, a, cfg,
                mode="ratio",
            ),
            (keys, pos, dirs, active, ext_w),
        )
    if want in ("rmo", "all"):
        report(
            "RMO delta track",
            lambda k, p, dd, a, e: pt._delta_track_rmo(
                k, p, dd, t0, t1, e, max_ext, a, cfg
            ),
            (keys, pos, dirs, active, ext),
        )


if __name__ == "__main__":
    main()
