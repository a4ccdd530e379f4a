#!/usr/bin/env python
"""Benchmark one full land-march substep body in an isolated while loop, to
compare against its in-situ cost inside the path tracer (~24 us/iter)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from digital_earth_tpu import constants as C
from digital_earth_tpu.assets.textures import load_texture_atlas
from digital_earth_tpu.ops import math_utils as mu
from digital_earth_tpu.ops import texture as tx


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1600
    k = 4
    iters = 100
    atlas = load_texture_atlas(procedural_resolution=(1024, 2048))
    topo = atlas.topography
    rng = np.random.default_rng(0)
    u = rng.normal(size=(n, 3))
    pos = jnp.asarray(
        (C.PLANET_R + 50e3) * u / np.linalg.norm(u, axis=-1, keepdims=True),
        dtype=jnp.float32,
    )
    d = rng.normal(size=(n, 3))
    dirn = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), dtype=jnp.float32)
    scale = jnp.float32(7800.0)
    arange_k = jnp.arange(k)[:, None].astype(jnp.float32)

    @jax.jit
    def march(topo, pos, dirn, t0):
        def body(s):
            i, t, stride, acc = s
            ts = t[None, :] + arange_k * stride[None, :]
            ro = pos[None] + ts[..., None] * dirn[None]
            sample = tx.sample_sphere_texture(topo, ro, bilinear=False)
            f = mu.length(ro) - C.PLANET_R - scale * sample[..., 0]

            def regional_skip(mip_val, valid):
                r_bound = C.PLANET_R + scale * mip_val
                b_near, b_far = mu.rsi(ro, dirn, r_bound)
                return jnp.where(
                    b_near > 0.0,
                    jnp.minimum(b_near, valid),
                    jnp.where(b_far < 0.0, valid, 0.0),
                )

            s_region = jnp.maximum(
                regional_skip(sample[..., 1], 25e3),
                regional_skip(sample[..., 2], 115e3),
            )
            step = jnp.where(f < 0.0, f, jnp.maximum(jnp.maximum(f, s_region), 600.0))
            acc = acc + jnp.sum(step)
            t = jnp.mod(t + jnp.abs(step[0]) + 1000.0, 3e6)
            stride = jnp.maximum(jnp.abs(step[-1]), 600.0)
            return i + 1, t, stride, acc

        return jax.lax.while_loop(lambda s: s[0] < iters, body, (0, t0, jnp.full((n,), 600.0), 0.0))[3]

    t0 = jnp.zeros((n,))
    out = jax.block_until_ready(march(topo, pos, dirn, t0))
    t1 = time.perf_counter()
    out = jax.block_until_ready(march(topo, pos, dirn, t0))
    dt = (time.perf_counter() - t1) / iters
    print(f"isolated march body (k={k}, n={n}): {dt*1e6:8.2f} us/iter")


if __name__ == "__main__":
    main()
