#!/usr/bin/env python3
"""Compat trilinear-gather experiments on the real TPU (VERDICT r1 #3).

The exact trilinear advect (simulation.cpp:392-420) is 8 arbitrary gathers;
round 1 measured XLA take at ~9 ns/element with flat/fancy/one-take all
equal. Hypothesis to test: is the cost per-INDEX or per-ELEMENT? If
per-index, packing the 8 corners into contiguous table rows (gather with
slice_sizes (1,k)) cuts the index count 8x.

Variants (flagship 128x64x64 advect geometry, slope-timed):
  take8      — current ops/advect.py formulation (8 flat takes)
  pair2x4    — table (N,4) of [f[i], f[i+1], f[i+W2], f[i+W2+1]]; 2 gathers
  row8       — table (N,8) adding the +-z pair; 1 gather
  take8_pib  — take8 with mode=promise_in_bounds (skips clamp logic)
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    W, H, D = 128, 64, 64
    W2, H2, D2 = W + 2, H + 2, D + 2
    N = D2 * H2 * W2
    SZ, SY = W2 * H2, W2
    n = 30

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.normal(size=(D2, H2, W2)).astype(np.float32))
    # realistic backtrace indices: near-identity plus noise
    xb = jnp.asarray(np.clip(
        np.arange(1, W + 1, dtype=np.float32)[None, None, :]
        + rng.uniform(-30, 12, size=(D, H, W)).astype(np.float32), 0.5, W + 0.5))
    yb = jnp.asarray(np.clip(
        np.arange(1, H + 1, dtype=np.float32)[None, :, None]
        + rng.uniform(-9, 9, size=(D, H, W)).astype(np.float32), 0.5, H + 0.5))
    zb = jnp.asarray(np.clip(
        np.arange(1, D + 1, dtype=np.float32)[:, None, None]
        + rng.uniform(-9, 9, size=(D, H, W)).astype(np.float32), 0.5, D + 0.5))

    def weights(xb, yb, zb):
        i0 = jnp.floor(xb).astype(jnp.int32)
        j0 = jnp.floor(yb).astype(jnp.int32)
        k0 = jnp.floor(zb).astype(jnp.int32)
        return i0, j0, k0, xb - i0, yb - j0, zb - k0

    def lerp8(c, sx, sy, sz):
        c000, c100, c010, c110, c001, c101, c011, c111 = c
        one = jnp.float32(1.0)
        c00 = c000 * (one - sx) + c100 * sx
        c01 = c001 * (one - sx) + c101 * sx
        c10 = c010 * (one - sx) + c110 * sx
        c11 = c011 * (one - sx) + c111 * sx
        c0 = c00 * (one - sy) + c10 * sy
        c1 = c01 * (one - sy) + c11 * sy
        return c0 * (one - sz) + c1 * sz

    def take8(f, _xb=xb, _yb=yb, _zb=zb, mode="clip"):
        i0, j0, k0, sx, sy, sz = weights(_xb, _yb, _zb)
        flat = f.reshape(-1)
        base = k0 * SZ + j0 * SY + i0

        def at(d):
            return jnp.take(flat, (base + d).reshape(-1),
                            mode=mode).reshape(base.shape)
        c = [at(d) for d in (0, 1, SY, SY + 1, SZ, SZ + 1, SZ + SY,
                             SZ + SY + 1)]
        return lerp8(c, sx, sy, sz)

    def take8_pib(f):
        return take8(f, mode="fill")  # fill skips the clamp path

    def gather_rows(table, idx, k):
        """table (N, k); gather rows at idx -> (cells, k)."""
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,))
        return lax.gather(table, idx.reshape(-1, 1), dnums,
                          slice_sizes=(1, k),
                          mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    def pair2x4(f):
        i0, j0, k0, sx, sy, sz = weights(xb, yb, zb)
        flat = f.reshape(-1)
        tbl = jnp.stack([flat,
                         jnp.roll(flat, -1),
                         jnp.roll(flat, -SY),
                         jnp.roll(flat, -(SY + 1))], axis=1)  # (N, 4)
        base = k0 * SZ + j0 * SY + i0
        g0 = gather_rows(tbl, base, 4).reshape(*base.shape, 4)
        g1 = gather_rows(tbl, base + SZ, 4).reshape(*base.shape, 4)
        c = (g0[..., 0], g0[..., 1], g0[..., 2], g0[..., 3],
             g1[..., 0], g1[..., 1], g1[..., 2], g1[..., 3])
        return lerp8(c, sx, sy, sz)

    def row8(f):
        i0, j0, k0, sx, sy, sz = weights(xb, yb, zb)
        flat = f.reshape(-1)
        tbl = jnp.stack([jnp.roll(flat, -d) for d in
                         (0, 1, SY, SY + 1, SZ, SZ + 1, SZ + SY,
                          SZ + SY + 1)], axis=1)  # (N, 8)
        base = k0 * SZ + j0 * SY + i0
        g = gather_rows(tbl, base, 8).reshape(*base.shape, 8)
        return lerp8(tuple(g[..., i] for i in range(8)), sx, sy, sz)

    def timeit(name, fn):
        def run_n(length):
            @jax.jit
            def run(f):
                def body(c, _):
                    out = fn(c)
                    return c.at[1:-1, 1:-1, 1:-1].set(out), None
                return jax.lax.scan(body, f, None, length=length)[0]
            return run
        try:
            r1, r3 = run_n(n), run_n(3 * n)
            jax.block_until_ready(r1(prev))
            jax.block_until_ready(r3(prev))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(r1(prev))
                t1 = time.perf_counter()
                jax.block_until_ready(r3(prev))
                t2 = time.perf_counter()
                best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
            print(f"{name:12s} {best * 1e3:8.3f} ms/advect", flush=True)
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:100]}",
                  flush=True)

    # correctness first (tiny tolerance: roll wraps differ only at edges the
    # clamp never reaches)
    ref = np.asarray(jax.jit(take8)(prev))
    for name, fn in (("take8_fill", take8_pib), ("pair2x4", pair2x4),
                     ("row8", row8)):
        got = np.asarray(jax.jit(fn)(prev))
        err = np.abs(got - ref).max()
        print(f"# {name} max|diff| = {err:.3g}", flush=True)

    timeit("take8", take8)
    timeit("take8_fill", take8_pib)
    timeit("pair2x4", pair2x4)
    timeit("row8", row8)
    return 0


if __name__ == "__main__":
    sys.exit(main())
