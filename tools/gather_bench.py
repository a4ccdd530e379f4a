#!/usr/bin/env python
"""Honest microbench of texel-fetch strategies on TPU.

Each variant fetches 4 channels for n random texels from a 1024x2048 texture,
inside a while loop with loop-carried indices (nothing constant-folds)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W, C = 1024, 2048, 4
T = H * W
LANES = 128


def timeit(fn, *args, iters=200):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters


def loopify(body, iters=200):
    @jax.jit
    def f(tbl, idx, acc):
        def b(s):
            i, idx, acc = s
            acc = acc + body(tbl, idx)
            idx = (idx * 1103515245 + 12345) % T
            return i + 1, idx, acc

        return jax.lax.while_loop(lambda s: s[0] < iters, b, (0, idx, acc))[2]

    return f


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6400
    rng = np.random.default_rng(0)
    tex = rng.integers(0, 255, (T, C), dtype=np.uint8)
    idx0 = jnp.asarray(rng.integers(0, T, n), dtype=jnp.int32)
    acc0 = jnp.zeros((n, C))

    # (a) current: row-gather layout (T//32, 128) u8 + one-hot select
    tpr = LANES // C
    n_rows = -(-T // tpr)
    rows_u8 = np.zeros((n_rows * tpr, C), np.uint8)
    rows_u8[:T] = tex
    rows_u8 = jnp.asarray(rows_u8.reshape(n_rows, LANES))

    def fetch_onehot(tbl, idx):
        r = idx // tpr
        lane0 = (idx % tpr) * C
        rows = tbl[r].astype(jnp.float32)
        li = jnp.arange(LANES, dtype=idx.dtype)
        return jnp.stack(
            [jnp.sum(rows * (li == (lane0[:, None] + c)), axis=-1) for c in range(C)],
            axis=-1,
        )

    # (b) row gather + take_along_axis lane extract
    def fetch_tala(tbl, idx):
        r = idx // tpr
        lane0 = (idx % tpr) * C
        rows = tbl[r]
        cols = lane0[:, None] + jnp.arange(C, dtype=idx.dtype)[None, :]
        return jnp.take_along_axis(rows, cols, axis=-1).astype(jnp.float32)

    # (c) direct (T, 4) u8 gather
    tex4 = jnp.asarray(tex)

    def fetch_direct(tbl, idx):
        return tbl[idx].astype(jnp.float32)

    # (d) packed u32 element gather + bit unpack
    tex_u32 = jnp.asarray(
        tex[:, 0].astype(np.uint32)
        | (tex[:, 1].astype(np.uint32) << 8)
        | (tex[:, 2].astype(np.uint32) << 16)
        | (tex[:, 3].astype(np.uint32) << 24)
    )

    def fetch_packed(tbl, idx):
        v = tbl[idx]
        return jnp.stack(
            [((v >> (8 * c)) & 0xFF).astype(jnp.float32) for c in range(C)], axis=-1
        )

    # (e) one-hot select via dot (MXU): rows (n,128) @ onehot128x4
    def fetch_dot(tbl, idx):
        r = idx // tpr
        lane0 = idx % tpr  # select via 32-wide reshape instead
        rows = tbl[r].astype(jnp.float32).reshape(-1, tpr, C)
        oh = (jnp.arange(tpr, dtype=idx.dtype)[None, :] == lane0[:, None]).astype(
            jnp.float32
        )
        return jnp.einsum("ntc,nt->nc", rows, oh)

    for name, fn, tbl in [
        ("a_row+onehot128", fetch_onehot, rows_u8),
        ("b_row+take_along", fetch_tala, rows_u8),
        ("c_direct(T,4)u8", fetch_direct, tex4),
        ("d_packed_u32", fetch_packed, tex_u32),
        ("e_row+reshape_oh32", fetch_dot, rows_u8),
    ]:
        f = loopify(fn)
        dt = timeit(f, tbl, idx0, acc0) * 1e6
        print(f"{name:20s} n={n}: {dt:8.2f} us/fetch-of-{n}")


if __name__ == "__main__":
    main()
