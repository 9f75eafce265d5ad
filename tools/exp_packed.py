"""Packed-interior solve kernel vs legacy padded kernel: parity + timing.

Run on the TPU. Times with the slope method (scan repetitions inside one
jit) per CLAUDE.md; parity is bitwise vs the legacy kernel on random
fields with an obstacle keep mask.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from fluid_simulation_tpu.kernels.linsolve_pallas import pallas_rbgs_solve

SHAPE = (66, 66, 130)   # flagship 128x64x64 padded
ACC = 15
A, C = 0.15, 1.9


def make_inputs(seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    field = rng.standard_normal(SHAPE).astype(dtype)
    prev = rng.standard_normal(SHAPE).astype(dtype)
    # real masks (build_masks) always have keep == 1 on the ghost shell;
    # the packed kernel's ghost algebra relies on that contract
    keep = np.ones(SHAPE, np.float32)
    keep[1:-1, 1:-1, 1:-1] = rng.random(tuple(n - 2 for n in SHAPE)) > 0.05
    return (jnp.asarray(field), jnp.asarray(prev),
            jnp.asarray(keep.astype(dtype)))


def parity(dtype=np.float32):
    field, prev, keep = make_inputs(dtype=dtype)
    for b in (0, 1, 2, 3):
        for empty in (False, True):
            kw = dict(a=A, c=C, acc=ACC, empty_scene=empty)
            legacy = pallas_rbgs_solve(b, field, prev, keep, **kw)
            packed = pallas_rbgs_solve(b, field, prev, keep, packed=True, **kw)
            eq = jax.jit(lambda x, y: jnp.all(x == y))(legacy, packed)
            print(f"{np.dtype(dtype).name} b={b} empty={empty}: "
                  f"bitwise equal = {bool(eq)}")
            if not bool(eq):
                d = jax.jit(lambda x, y: jnp.max(jnp.abs(
                    x.astype(jnp.float32) - y.astype(jnp.float32))))(
                        legacy, packed)
                print("   max |diff| =", float(d))


def timing(packed: bool, reps=30):
    field, prev, keep = make_inputs()

    def make_run(n):
        @jax.jit
        def run(f, p, k):
            def body(carry, _):
                out = pallas_rbgs_solve(0, carry, p, k, a=A, c=C, acc=ACC,
                                        packed=packed)
                return out, ()
            out, _ = jax.lax.scan(body, f, None, length=n)
            return out
        return run

    ts = []
    for n in (4, 4 + reps):
        run = make_run(n)
        r = run(field, prev, keep)
        r.block_until_ready()
        t0 = time.time()
        r = run(field, prev, keep)
        r.block_until_ready()
        ts.append(time.time() - t0)
    per_solve = (ts[1] - ts[0]) / reps
    print(f"packed={packed}: {per_solve*1e6:.1f} us/solve "
          f"({per_solve/ACC*1e6:.2f} us/sweep)")


if __name__ == "__main__":
    import sys
    t0 = time.time()
    if "bf16" in sys.argv:
        import ml_dtypes
        parity(dtype=ml_dtypes.bfloat16)
    else:
        parity()
        timing(False)
        timing(True)
    print("total %.1fs" % (time.time() - t0))
