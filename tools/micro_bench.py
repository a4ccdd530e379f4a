#!/usr/bin/env python
"""Microbenchmarks for the primitive costs that bound the path tracer:
while-loop iteration overhead, texture row-gather cost, and VPU elementwise
cost at various lane counts. Run on the real TPU chip."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def bench_while_overhead(n, iters=1000):
    """Near-empty while loop: measures per-iteration loop overhead."""

    @jax.jit
    def f(x):
        def body(s):
            i, x = s
            return i + 1, x * 1.0000001 + 1e-9

        def cond(s):
            return s[0] < iters

        return jax.lax.while_loop(cond, body, (0, x))[1]

    x = jnp.ones((n,))
    dt = timeit(lambda v: f(v), x, reps=5)
    return dt / iters


def bench_vpu_chain(n, ops=100, iters=100):
    """Chain of `ops` fused elementwise ops inside a while loop."""

    @jax.jit
    def f(x):
        def body(s):
            i, x = s
            for _ in range(ops):
                x = x * 1.0000001 + 1e-9
            return i + 1, x

        return jax.lax.while_loop(lambda s: s[0] < iters, body, (0, x))[1]

    x = jnp.ones((n,))
    dt = timeit(lambda v: f(v), x, reps=5)
    return dt / iters


def bench_transcendental(n, ops=10, iters=100):
    """Chain of exp/log ops (tracking loops are full of these)."""

    @jax.jit
    def f(x):
        def body(s):
            i, x = s
            for _ in range(ops):
                x = jnp.log(jnp.exp(x * 0.999) + 1e-6)
            return i + 1, x

        return jax.lax.while_loop(lambda s: s[0] < iters, body, (0, x))[1]

    x = jnp.ones((n,))
    dt = timeit(lambda v: f(v), x, reps=5)
    return dt / iters


def bench_row_gather(n, rows_shape=(1823400, 128), dtype=jnp.uint8, iters=50):
    """Random row gather (n,128) from a big table inside a while loop."""
    tbl = jnp.zeros(rows_shape, dtype=dtype)

    @jax.jit
    def f(tbl, idx):
        def body(s):
            i, acc, idx = s
            rows = tbl[idx]  # (n, 128) gather
            acc = acc + jnp.sum(rows.astype(jnp.float32), axis=-1)
            idx = (idx * 1103515245 + 12345) % rows_shape[0]
            return i + 1, acc, idx

        return jax.lax.while_loop(lambda s: s[0] < iters, body, (0, jnp.zeros((n,)), idx))[1]

    idx = jnp.asarray(np.random.randint(0, rows_shape[0], (n,)), dtype=jnp.int32)
    dt = timeit(lambda a, b: f(a, b), tbl, idx, reps=5)
    return dt / iters


def bench_sin_atan2(n, iters=100):
    """sphere_uv_map-style math: atan2 + acos + normalize per tap."""

    @jax.jit
    def f(p):
        def body(s):
            i, p, acc = s
            q = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
            u = jnp.arctan2(q[..., 2], q[..., 0])
            v = jnp.arccos(jnp.clip(q[..., 1], -1, 1))
            acc = acc + u + v
            p = p + 1.0
            return i + 1, p, acc

        return jax.lax.while_loop(lambda s: s[0] < iters, body, (0, p, jnp.zeros(p.shape[0])))[2]

    p = jnp.ones((n, 3)) * 6.4e6
    dt = timeit(lambda v: f(v), p, reps=5)
    return dt / iters


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}")
    for n in (1600, 6400, 25600, 102400):
        o = bench_while_overhead(n) * 1e6
        v = bench_vpu_chain(n) * 1e6
        t = bench_transcendental(n) * 1e6
        g = bench_row_gather(n) * 1e6
        s = bench_sin_atan2(n) * 1e6
        print(
            f"n={n:7d}: while-iter {o:7.2f} us | +100 mul-add {v:7.2f} us | "
            f"+10 exp-log {t:7.2f} us | row-gather(n,128)u8 {g:7.2f} us | "
            f"uv-map {s:7.2f} us"
        )
