#!/usr/bin/env python3
"""Cost split of the packed 1-sweep stream kernel at 256^3 (empty scene).

copy2h (same window structure, zero VPU) runs 657 us vs the sweep's 871,
and sweepish (copy2h + 30 full-block FMAs) shows compute fully overlaps
DMA — so ~215 us of the sweep is NON-overlapped in-kernel work. Variants
here degrade the kernel one mechanism at a time (numerics intentionally
wrong; only time matters) to locate it:

  full     - production kernel body (baseline; bitwise right)
  nosel    - parity/edge selects dropped: upd everywhere (keeps iotas+rolls)
  noiota   - no iotas/parity/edge masks; neighbors = plain rolls + z slices
  noroll   - no x/y rolls: s = 4*f + z-neighbors (keeps iotas/selects)
  nozn     - no z-neighbor row slices (keeps everything else)
  arith    - out = (rhs + a*6*f) * crec only (the pure stream floor)

Usage: python tools/exp_sweepcost.py [W H D]
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from fluid_simulation_tpu.kernels.linsolve_pallas import (
        VMEM_BUDGET_BYTES, _roll)

    W, H, D = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (
        256, 256, 256)
    blk, hb = 16, 8
    nblk = -(-D // blk)
    nhb = -(-D // hb)
    n = 10
    a_lit, crec_lit = 1e-4, 1.0 / 1.0006

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    f0 = jnp.zeros((D, H, W), jnp.float32) + 0.1

    mid = pl.BlockSpec((blk, H, W), lambda k: (k, 0, 0),
                       memory_space=pltpu.VMEM)
    lo = pl.BlockSpec((hb, H, W), lambda k: (jnp.maximum(k * 2 - 1, 0), 0, 0),
                      memory_space=pltpu.VMEM)
    hi = pl.BlockSpec((hb, H, W),
                      lambda k: (jnp.minimum(k * 2 + 2, nhb - 1), 0, 0),
                      memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET_BYTES)

    def make(variant):
        def body(plo, pmid, phi, rlo, rmid, rhi, out, ext, pw):
            k = pl.program_id(0)
            pw[0:2] = plo[hb - 2:]
            pw[2:blk + 2] = pmid[...]
            pw[blk + 2:] = phi[:2]
            ext[...] = pw[...]
            rhs = jnp.concatenate([rlo[hb - 1:], rmid[...], rhi[:1]], axis=0)
            a_c = jnp.asarray(a_lit, jnp.float32)
            crec = jnp.asarray(crec_lit, jnp.float32)

            def halfsweep(lo_e, hi_e, want_red):
                nn = hi_e - lo_e + 1
                f = ext[lo_e:hi_e + 1]
                pre = pw[lo_e:hi_e + 1]
                if variant == "arith":
                    upd = (rhs[lo_e - 1:hi_e] + a_c * (6.0 * f)) * crec
                    ext[lo_e:hi_e + 1] = upd
                    return
                if variant != "noiota":
                    iz = jax.lax.broadcasted_iota(jnp.int32, (nn, H, W), 0)
                    iy = jax.lax.broadcasted_iota(jnp.int32, (nn, H, W), 1)
                    ix = jax.lax.broadcasted_iota(jnp.int32, (nn, H, W), 2)
                    gp = iz + (k * blk - 2 + lo_e)
                    parity = ((gp + iy + ix) % 2) == 1
                    if not want_red:
                        parity = jnp.logical_not(parity)
                    sel = parity & (gp >= 0) & (gp <= D - 1)
                if variant == "noroll":
                    xp = xm = yp = ym = f
                else:
                    xpn = _roll(f, W - 1, 2)
                    xmn = _roll(f, 1, 2)
                    ypn = _roll(f, H - 1, 1)
                    ymn = _roll(f, 1, 1)
                    if variant == "noiota":
                        xp, xm, yp, ym = xpn, xmn, ypn, ymn
                    else:
                        xp = jnp.where(ix == W - 1, pre, xpn)
                        xm = jnp.where(ix == 0, -pre, xmn)
                        yp = jnp.where(iy == H - 1, pre, ypn)
                        ym = jnp.where(iy == 0, pre, ymn)
                if variant == "nozn":
                    zp = zm = f
                elif variant == "noiota":
                    zp = ext[lo_e + 1:hi_e + 2]
                    zm = ext[lo_e - 1:hi_e]
                else:
                    zp = jnp.where(gp == D - 1, pre, ext[lo_e + 1:hi_e + 2])
                    zm = jnp.where(gp == 0, pre, ext[lo_e - 1:hi_e])
                s = (((xp + xm) + yp) + ym + zp) + zm
                upd = (rhs[lo_e - 1:hi_e] + a_c * s) * crec
                if variant in ("nosel", "noiota"):
                    ext[lo_e:hi_e + 1] = upd
                else:
                    ext[lo_e:hi_e + 1] = jnp.where(sel, upd, f)

            halfsweep(1, blk + 2, True)
            halfsweep(2, blk + 1, False)
            out[...] = ext[2:blk + 2]

        return pl.pallas_call(
            body, grid=(nblk,),
            out_shape=jax.ShapeDtypeStruct((D, H, W), jnp.float32),
            in_specs=[lo, mid, hi] * 2, out_specs=mid,
            scratch_shapes=[pltpu.VMEM((blk + 4, H, W), jnp.float32)
                            for _ in range(2)],
            compiler_params=cp)

    def timeit(name, call):
        def run_n(length):
            @jax.jit
            def run(c):
                return jax.lax.scan(
                    lambda c, _: (call(c, c, c, c, c, c), None), c, None,
                    length=length)[0]
            return run
        r1, r3 = run_n(n), run_n(3 * n)
        jax.block_until_ready(r1(f0))
        jax.block_until_ready(r3(f0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); jax.block_until_ready(r1(f0))
            t1 = time.perf_counter(); jax.block_until_ready(r3(f0))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
        print(f"{name:8s} {best * 1e6:9.1f} us/sweep", flush=True)
        return best

    for v in ("full", "nosel", "noiota", "noroll", "nozn", "arith"):
        try:
            timeit(v, make(v))
        except Exception as e:
            print(f"{v} failed: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
