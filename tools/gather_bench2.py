#!/usr/bin/env python
"""Gather cost model: what controls the ~13.5 ns/tap row-gather price?

The tracer is gather-transaction-bound (tools/ceiling_bench.py: taps x
13.5 ns explain ~2/3 of the Apollo frame), so this sweeps the axes that
could change the per-tap price:

  - BATCH width 128..30720 queries per gather op — fixed-cost amortization
    (decides whether narrow straggler loops pay; see intersect_land's
    tail-narrowing);
  - query COHERENCE: uniform-random vs 2D-clustered (a coherent pixel
    block's taps) vs consecutive rows — DRAM locality vs issue cost;
  - texture SIZE: 1024-res (8 MB plane) vs tier-2 10800-res (890 MB) —
    the measured 2x tier-2 frame slowdown at identical tap counts;
  - row DTYPE width: u8 (128 B row) vs f32 (512 B row).

Pitfall this version avoids: reducing each gathered row to a scalar inside
the loop lets XLA hoist the (loop-invariant) per-row reduction OUT of the
loop and gather 4-byte scalars instead — the first version measured
0.05 ns/tap "gathers" that never touched the rows. The accumulator here is
the full (n, 128) row sum, which cannot be precomputed.

Also measures the while-op fixed cost per iteration (empty-body loop), the
other term in the narrow-loop economics.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp

    LANES = 128
    ITERS = 64

    def measure(rows, ridx):
        n = ridx.shape[0]
        nr = rows.shape[0]

        @jax.jit
        def loop(rows, ridx):
            def body(i, acc):
                r = (ridx + i * 40503) % nr  # new pattern per iter
                return acc + rows[r].astype(jnp.float32)

            return jax.lax.fori_loop(
                0, ITERS, body, jnp.zeros((n, LANES), jnp.float32)
            )

        loop(rows, ridx).block_until_ready()
        t0 = time.perf_counter()
        loop(rows, ridx).block_until_ready()
        dt = time.perf_counter() - t0
        return dt / (n * ITERS) * 1e9

    rng = np.random.default_rng(0)

    # while-op fixed cost: same loop, no gather, tiny carry
    @jax.jit
    def empty_loop(x):
        def body(i, acc):
            return acc * 0.9999 + 1.0

        return jax.lax.fori_loop(0, 4096, body, x)

    empty_loop(jnp.zeros((8, 128))).block_until_ready()
    t0 = time.perf_counter()
    empty_loop(jnp.zeros((8, 128))).block_until_ready()
    print(f"while-op fixed cost: "
          f"{(time.perf_counter() - t0) / 4096 * 1e6:.2f} us/iteration "
          "(empty body, (8,128) carry)", flush=True)

    for res in (1024, 10800):
        h, w = res, 2 * res
        n_rows = h * w * 4 // LANES  # 4-channel u8, 32 texels/row
        rows_u8 = jnp.asarray(
            rng.integers(0, 255, (n_rows, LANES), dtype=np.uint8)
        )
        print(f"--- texture {h}x{w} u8x4: {n_rows} rows "
              f"({n_rows * LANES / 2**20:.0f} MB) ---", flush=True)

        for n in (128, 256, 512, 1920, 7680, 30720):
            uni = jnp.asarray(
                rng.integers(0, n_rows, n, dtype=np.int64), jnp.int32
            )
            tpr = 32
            cy, cx = h // 2, w // 2
            qy = np.clip(cy + rng.integers(-32, 32, n), 0, h - 1)
            qx = np.clip(cx + rng.integers(-32, 32, n), 0, w - 1)
            clu = jnp.asarray((qy * w + qx) // tpr, jnp.int32)
            seq = jnp.asarray(np.arange(n) + n_rows // 3, jnp.int32)
            t_uni = measure(rows_u8, uni)
            t_clu = measure(rows_u8, clu)
            t_seq = measure(rows_u8, seq)
            print(f"n={n:6d}  uniform {t_uni:7.2f}  clustered {t_clu:7.2f}"
                  f"  consecutive {t_seq:7.2f} ns/tap", flush=True)

        nf = 7680
        rows_f32 = jnp.asarray(
            rng.standard_normal((n_rows // 4, LANES)), jnp.float32
        )
        uni_f = jnp.asarray(
            rng.integers(0, n_rows // 4, nf, dtype=np.int64), jnp.int32
        )
        print(f"f32 rows (512B): uniform {measure(rows_f32, uni_f):7.2f} "
              "ns/tap at n=7680", flush=True)

        # dependent chain: each iteration's rows derive from the previous
        # gather's values — the real trackers' structure (positions evolve
        # from sampled data), so pipelining across iterations is impossible
        def measure_dep(rows, ridx):
            n = ridx.shape[0]
            nr = rows.shape[0]

            @jax.jit
            def loop(rows, ridx):
                def body(i, carry):
                    r, acc = carry
                    g = rows[r]
                    acc = acc + g.astype(jnp.float32)
                    r = (r + g[:, 0].astype(jnp.int32) + 1) % nr
                    return r, acc

                return jax.lax.fori_loop(
                    0, ITERS, body,
                    (ridx, jnp.zeros((n, LANES), jnp.float32)),
                )[1]

            loop(rows, ridx).block_until_ready()
            t0 = time.perf_counter()
            loop(rows, ridx).block_until_ready()
            dt = time.perf_counter() - t0
            gbs = n * ITERS * LANES / dt / 1e9
            return dt / (n * ITERS) * 1e9, gbs

        for n in (1920, 7680):
            uni = jnp.asarray(
                rng.integers(0, n_rows, n, dtype=np.int64), jnp.int32
            )
            t, gbs = measure_dep(rows_u8, uni)
            print(f"dependent-chain uniform n={n}: {t:7.2f} ns/tap "
                  f"({gbs:.0f} GB/s gathered)", flush=True)

        # blocked (locality-preserving) row layout under 2D-clustered
        # queries, dependent-chain: would re-ordering texel strips into 2D
        # blocks make a coherent tile's taps cheaper? The clustered row ids
        # of a row-major layout span (64 y-lines) x (w/32 strips)-strided
        # rows; a blocked layout maps the same 2D disc onto a handful of
        # contiguous ~16 KB spans.
        n = 7680
        tpr = 32
        cy, cx = h // 2, w // 2
        qy = np.clip(cy + rng.integers(-32, 32, n), 0, h - 1)
        qx = np.clip(cx + rng.integers(-32, 32, n), 0, w - 1)
        strips = w // tpr
        # row-major clustered (the current layout)
        rm = jnp.asarray(qy.astype(np.int64) * strips + qx // tpr, jnp.int32)
        t, gbs = measure_dep(rows_u8, rm)
        print(f"dep-chain clustered row-major: {t:7.2f} ns/tap "
              f"({gbs:.0f} GB/s)", flush=True)
        # blocked: BY x BX strip blocks (divisor-chosen)
        BY = 8 if h % 8 == 0 else 15
        BX = 8 if strips % 8 == 0 else (9 if strips % 9 == 0 else 5)
        by_, ly = qy // BY, qy % BY
        bx_, lx = (qx // tpr) // BX, (qx // tpr) % BX
        blk = (by_ * (strips // BX) + bx_) * (BY * BX) + ly * BX + lx
        blk = jnp.asarray(blk.astype(np.int64), jnp.int32)
        t, gbs = measure_dep(rows_u8, blk)
        print(f"dep-chain clustered blocked({BY}x{BX}): {t:7.2f} ns/tap "
              f"({gbs:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
