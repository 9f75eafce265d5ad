#!/usr/bin/env python3
"""Experiment: move the RBGS x-neighbor pair onto the MXU.

The resident solve kernel (kernels/linsolve_pallas.py) costs ~27 us/sweep at
128x64x64 — ~10x the VPU flop bound — dominated by Mosaic relayouts for the
±1 lane/sublane stencil shifts (NOTES.md roofline). The x pair
``f[w-1] + f[w+1]`` is expressible as one banded matmul ``f @ Bx`` with
``Bx[w', w] = [|w' - w| == 1]``: a two-nonzero-term dot per output is a
single f32 add (same value as the VPU ``xp + xm``, associativity-free), so
the kernel stays bit-exact while the lane relayouts disappear and the work
rides the otherwise-idle MXU.

Variants measured (b=0, empty scene, f32, slope-timed scan of whole solves):
  base    — current kernel (lane+sublane shifts on the VPU)
  mxu_x   — x pair via in-kernel dot_general, y via sublane shifts, z free
Bit-equality of the results is asserted before timing.

Usage: python tools/exp_solve_mxu.py [W H D [acc [n]]]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_mxu_solve(acc, a, c, shape, wall_mode="reference"):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from fluid_simulation_tpu.kernels.linsolve_pallas import (
        VMEM_BUDGET_BYTES, _tiled_bytes)

    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    a_lit = float(np.float32(a))
    crec_lit = float(np.float32(1.0) / np.float32(c))
    sx, sy, sz = 1.0, 1.0, 1.0   # b=0 scalar bounds

    def kernel(prev_ref, field_ref, out_ref):
        out_ref[...] = field_ref[...]
        prev_i = prev_ref[1:-1, 1:-1, 1:-1]
        iz = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 0)
        iy = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 1)
        ix = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 2)
        red = ((iz + iy + ix) % 2) == 1
        a_c = jnp.asarray(a_lit, jnp.float32)
        crec = jnp.asarray(crec_lit, jnp.float32)
        # band matrix mapping full-width rows to interior x-pair sums:
        # Bx[w', k] = 1 where w' == k or w' == k+2  ->  xs[.., k] =
        # f[.., k] + f[.., k+2] = xp + xm at interior cell x = k+1
        iw = jax.lax.broadcasted_iota(jnp.int32, (W2, W), 0)
        kw = jax.lax.broadcasted_iota(jnp.int32, (W2, W), 1)
        bx = ((iw == kw) | (iw == kw + 2)).astype(jnp.float32)

        def half(take_red):
            f = out_ref[...]
            # 2-D matmul over collapsed rows (Mosaic MXU path), slice after
            xs = jax.lax.dot_general(
                f.reshape(D2 * H2, W2), bx, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
            ).reshape(D2, H2, W)[1:-1, 1:-1, :]           # (D, H, W)
            s = (
                ((xs + f[1:-1, 2:, 1:-1]) + f[1:-1, :-2, 1:-1])
                + f[2:, 1:-1, 1:-1]
            ) + f[:-2, 1:-1, 1:-1]
            upd = (prev_i + a_c * s) * crec
            cur = f[1:-1, 1:-1, 1:-1]
            sel = red if take_red else jnp.logical_not(red)
            out_ref[1:-1, 1:-1, 1:-1] = jnp.where(sel, upd, cur)

        def sweep(i, _):
            half(True)
            half(False)
            out_ref[1:-1, 1:-1, 0] = sx * out_ref[1:-1, 1:-1, 1]
            out_ref[1:-1, 1:-1, W + 1] = out_ref[1:-1, 1:-1, W]
            out_ref[1:-1, 0, 1:-1] = sy * out_ref[1:-1, 1, 1:-1]
            out_ref[1:-1, H + 1, 1:-1] = sy * out_ref[1:-1, H, 1:-1]
            out_ref[0, 1:-1, 1:-1] = sz * out_ref[1, 1:-1, 1:-1]
            out_ref[D + 1, 1:-1, 1:-1] = sz * out_ref[D, 1:-1, 1:-1]
            return 0

        jax.lax.fori_loop(0, acc, sweep, 0)

    @jax.jit
    def solve(field, prev):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            input_output_aliases={1: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_BUDGET_BYTES),
            cost_estimate=pl.CostEstimate(
                flops=(10 + 2 * W2) * acc * 2 * int(np.prod(shape)),
                bytes_accessed=4 * _tiled_bytes(shape), transcendentals=0),
        )(prev, field)

    return solve


def main():
    import jax
    import jax.numpy as jnp
    from fluid_simulation_tpu.kernels.linsolve_pallas import pallas_rbgs_solve

    args = [int(x) for x in sys.argv[1:]]
    W, H, D = args[:3] if len(args) >= 3 else (128, 64, 64)
    acc = args[3] if len(args) > 3 else 15
    n = args[4] if len(args) > 4 else 50
    shape = (D + 2, H + 2, W + 2)

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    rng = np.random.default_rng(0)
    f0 = rng.normal(size=shape).astype(np.float32)
    g0 = rng.normal(size=shape).astype(np.float32)

    base = jax.jit(lambda f, p: pallas_rbgs_solve(
        0, f, p, None, 1.0, 6.0, acc=acc, empty_scene=True))
    mxu = make_mxu_solve(acc, 1.0, 6.0, shape)

    # bit-equality first
    r_base, r_mxu = base(f0, g0), mxu(f0, g0)
    diff = float(np.abs(np.asarray(jax.jit(
        lambda a, b: jnp.max(jnp.abs(a - b)))(r_base, r_mxu))))
    print(f"max |base - mxu_x| = {diff:.3e}  "
          f"({'BIT-EQUAL' if diff == 0 else 'DIFFERS'})")

    def timed(solve):
        @functools.partial(jax.jit, static_argnames=("length",))
        def scan_n(f, p, length):
            def body(c, _):
                return solve(c, p), None
            return jax.lax.scan(body, f, None, length=length)[0]

        jax.block_until_ready(scan_n(f0, g0, length=n))
        jax.block_until_ready(scan_n(f0, g0, length=3 * n))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(scan_n(f0, g0, length=n))
            t1 = time.perf_counter()
            jax.block_until_ready(scan_n(f0, g0, length=3 * n))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
        return best

    t_base = timed(lambda f, p: pallas_rbgs_solve(
        0, f, p, None, 1.0, 6.0, acc=acc, empty_scene=True))
    t_mxu = timed(mxu)
    print(f"{W}x{H}x{D} acc={acc}: base {t_base * 1e3:.3f} ms/solve "
          f"({t_base / acc * 1e6:.1f} us/sweep), "
          f"mxu_x {t_mxu * 1e3:.3f} ms/solve "
          f"({t_mxu / acc * 1e6:.1f} us/sweep) -> "
          f"{t_base / t_mxu:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
