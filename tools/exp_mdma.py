#!/usr/bin/env python3
"""On-chip A/B: merged-window manual-DMA solve passes vs the production
BlockSpec stream kernels (VERDICT r4 #1 attack; see kernels/linsolve_mdma).

Times WHOLE 15-sweep solves (sweep-1 + passes + rebuild, the production
composition) per variant, slope-timed, plus a bitwise cross-check of final
states between variants on the same inputs (real random data — constant
inputs let XLA elide DMAs and produced garbage bf16 numbers in exp_dma).

Usage: python tools/exp_mdma.py W H D [sphere] [VARIANT ...]
  variants: prod (dispatch ladder choice), mdma (auto params),
            mdma:BLK:NSW (explicit), stream (1-sweep), stream_t (ksw=2)
"""
import hashlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from fluid_simulation_tpu.ops.linsolve import linear_solver
    from fluid_simulation_tpu.scene.masks import build_masks
    from fluid_simulation_tpu.scene.primitives import (
        add_sphere, empty_obstacles)
    from fluid_simulation_tpu.kernels.linsolve_mdma import (
        mdma_params, pallas_rbgs_solve_mdma)
    from fluid_simulation_tpu.kernels.linsolve_stream import (
        pallas_rbgs_solve_stream, pallas_rbgs_solve_stream_t)

    args = sys.argv[1:]
    W, H, D = int(args[0]), int(args[1]), int(args[2])
    sphere = "sphere" in args
    variants = [a for a in args[3:] if a != "sphere"] or [
        "stream", "stream_t", "mdma"]

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    print("warmup ok", flush=True)

    shape = (D + 2, H + 2, W + 2)
    obs = (add_sphere(empty_obstacles(W, H, D), W // 3, H // 2, D // 2,
                      H // 6) if sphere else empty_obstacles(W, H, D))
    masks = build_masks(np.asarray(obs, np.float32))
    empty = not sphere
    keep = masks.keep_scalar
    rng = np.random.default_rng(5)
    f0 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    g0 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    acc = 15
    n = 5

    print(f"auto mdma params: {mdma_params(shape, jnp.float32, sphere)}",
          flush=True)

    def solver_for(variant):
        if variant == "prod":
            from fluid_simulation_tpu.ops.linsolve import linear_solver
            return lambda f: linear_solver(
                0, f, g0, 1.0, 6.0, masks, acc=acc, solver="rbgs",
                use_pallas=True, empty_scene=empty)
        if variant == "stream":
            return lambda f: pallas_rbgs_solve_stream(
                0, f, g0, keep, 1.0, 6.0, acc=acc, empty_scene=empty)
        if variant == "stream_t":
            return lambda f: pallas_rbgs_solve_stream_t(
                0, f, g0, keep, 1.0, 6.0, acc=acc, empty_scene=empty,
                blk=16, ksw=2)
        if variant.startswith("mdma"):
            parts = variant.split(":")
            kw = {}
            if len(parts) == 3:
                kw = dict(blk=int(parts[1]), nsw=int(parts[2]))
            return lambda f: pallas_rbgs_solve_mdma(
                0, f, g0, keep, 1.0, 6.0, acc=acc, empty_scene=empty, **kw)
        raise ValueError(variant)

    shas = {}
    for variant in variants:
        try:
            sol = solver_for(variant)

            def run_n(length):
                @jax.jit
                def run(f):
                    return jax.lax.scan(
                        lambda c, _: (sol(c), None), f, None,
                        length=length)[0]
                return run
            r1, r3 = run_n(n), run_n(3 * n)
            out = r1(f0)
            jax.block_until_ready(out)
            shas[variant] = hashlib.sha256(
                np.asarray(out).tobytes()).hexdigest()[:16]
            jax.block_until_ready(r3(f0))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter(); jax.block_until_ready(r1(f0))
                t1 = time.perf_counter(); jax.block_until_ready(r3(f0))
                t2 = time.perf_counter()
                best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
            per_sweep = best / acc
            print(f"{variant:14s} {best * 1e3:9.3f} ms/solve  "
                  f"{per_sweep * 1e6:7.1f} us/sweep  sha={shas[variant]}",
                  flush=True)
        except Exception as e:
            print(f"{variant:14s} FAILED {type(e).__name__}: {e}",
                  flush=True)
    if len(set(shas.values())) > 1:
        print(f"SHA MISMATCH: {shas}", flush=True)
    elif shas:
        print("all variants bitwise-identical", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
