#!/usr/bin/env python3
"""Probe: (a) can Mosaic transpose 2-D f32 values in-kernel on the v5e, and
at what cost; (b) what do the advect pass-boundary transposes really cost at
256-class grids?

Motivation (round-3 profile at 256^3): velocity advect = 15.5 ms but the
three stacked lane-lerp passes alone are ~3x3.1 = 9.3 ms — the ~6 ms gap is
the XLA-materialised (z,y,x)<->(z,x,y)/(y,x,z) transposes between passes
plus the 1.5x lane-tile tax on 258-wide transposed sources. If a kernel can
transpose (H2, 128) VMEM blocks itself, the y/z passes can read the
untransposed array directly and both costs disappear.

Usage: python tools/exp_transpose.py probe          # in-kernel transpose probe
       python tools/exp_transpose.py boundary [WHD] # pass-boundary cost
"""

import sys
import time

import numpy as np


def _warm():
    import jax
    import jax.numpy as jnp
    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())


def slope(run_n, *args, n=20, reps=3):
    import jax
    r1, r3 = run_n(n), run_n(3 * n)
    jax.block_until_ready(r1(*args))
    jax.block_until_ready(r3(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(r1(*args))
        t1 = time.perf_counter()
        jax.block_until_ready(r3(*args))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
    return best


def probe():
    """Try jnp.swapaxes on 2-D f32 values inside a kernel at the shapes the
    y/z passes would need; report compile+run status and per-call cost."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _warm()

    def mk(shape):
        R, C = shape

        def kernel(a_ref, o_ref):
            o_ref[...] = jnp.swapaxes(a_ref[...], 0, 1)

        def f(a):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((C, R), a.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a)
        return f

    shapes = [(256, 128), (128, 256), (258, 128), (264, 128), (256, 256),
              (2048, 128), (128, 2048), (1024, 256)]
    for shape in shapes:
        a = jnp.asarray(np.random.default_rng(0).standard_normal(
            shape, np.float32))
        try:
            f = jax.jit(mk(shape))
            out = np.asarray(f(a))
            ok = np.array_equal(out, np.asarray(a).T)
            # per-call cost inside a scan (self-chained: transpose twice)
            g2 = jax.jit(mk(shape[::-1]))

            def run_n(length):
                @jax.jit
                def run(x):
                    def body(c, _):
                        return g2(f(c) + 1.0), None
                    return jax.lax.scan(body, x, None, length=length)[0]
                return run
            t = slope(run_n, a)
            print(f"{shape}: OK exact={ok}  {t * 1e6:.1f} us/round-trip "
                  f"({t / (2 * shape[0] * shape[1]) * 1e9:.2f} ns/elem)",
                  flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"{shape}: FAIL {type(e).__name__}: {msg}", flush=True)
    return 0


def probe3():
    """Rank-3 primitives the z pass would need: (a) swapaxes(0,1) moving a
    major dim past the sublane dim, (b) a strided one-sublane-row load
    a_ref[:, s, :], (c) 2-D transpose of a major-dim slice."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _warm()
    rng = np.random.default_rng(0)

    def run_case(name, shape, build):
        a = jnp.asarray(rng.standard_normal(shape, np.float32))
        try:
            f, check = build(shape)
            out = np.asarray(jax.jit(f)(a))
            ok = np.array_equal(out, check(np.asarray(a)))

            def run_n(length):
                @jax.jit
                def run(x):
                    def body(c, _):
                        return c + 1.0, f(c).sum()
                    return jax.lax.scan(body, x, None, length=length)[1]
                return run
            t = slope(run_n, a)
            print(f"{name} {shape}: OK exact={ok}  {t * 1e6:.1f} us/call",
                  flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"{name} {shape}: FAIL {type(e).__name__}: {msg}",
                  flush=True)

    def swap01(shape):
        Z, Y, X = shape

        def kernel(a_ref, o_ref):
            o_ref[...] = jnp.swapaxes(a_ref[...], 0, 1)

        def f(a):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((Y, Z, X), a.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a)
        return f, lambda a: np.swapaxes(a, 0, 1)

    def strided_row(shape):
        Z, Y, X = shape

        def kernel(a_ref, o_ref):
            o_ref[...] = a_ref[:, 3, :]

        def f(a):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((Z, X), a.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a)
        return f, lambda a: a[:, 3, :]

    def major_slice_T(shape):
        Z, Y, X = shape

        def kernel(a_ref, o_ref):
            # z-pass inner op: one y row -> (Z, X) -> transpose -> (X, Z)
            o_ref[...] = jnp.swapaxes(a_ref[:, 3, :], 0, 1)

        def f(a):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((X, Z), a.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a)
        return f, lambda a: a[:, 3, :].T

    def store_strided(shape):
        Z, Y, X = shape

        def kernel(a_ref, o_ref):
            for s in range(Y):
                o_ref[:, s, :] = a_ref[:, s, :] * 2.0

        def f(a):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((Z, Y, X), a.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a)
        return f, lambda a: a * 2.0

    for shape in [(258, 8, 128), (130, 8, 128), (258, 16, 128)]:
        run_case("swap01", shape, swap01)
        run_case("strided_row", shape, strided_row)
        run_case("major_slice_T", shape, major_slice_T)
        run_case("store_strided", shape, store_strided)
    return 0


def boundary():
    """Pass-boundary cost at 256-class grids: time x-pass-only, x+y, and
    y-pass-on-pretransposed maps; boundary = (x+y) - x - y_alone."""
    import jax
    import jax.numpy as jnp
    from fluid_simulation_tpu.kernels.advect_pallas import lane_lerp_stack

    W, H, D = (int(a) for a in sys.argv[2:5]) if len(sys.argv) > 4 else (
        256, 256, 256)
    D2, H2, W2 = D + 2, H + 2, W + 2
    _warm()
    rng = np.random.default_rng(0)
    stack = jnp.asarray(rng.standard_normal((3, D2, H2, W2), np.float32))
    vx = jnp.asarray(rng.standard_normal((D2, H2, W2), np.float32) * 0.02)
    dtW = np.float32(0.05 * W)

    def xpass(prev, v):
        xi = jnp.arange(1, W + 1, dtype=jnp.float32).reshape(1, 1, W)
        xb = jnp.clip(xi - dtW * v[:, :, 1:-1], 0.5, W + 0.5)
        a = lane_lerp_stack(prev.reshape(3, D2 * H2, W2),
                            xb.reshape(D2 * H2, W))
        A = a.reshape(3, D2, H2, W)
        # pad x back to keep the carry shape closed
        return jnp.concatenate([A[..., :1], A, A[..., -1:]], axis=-1)

    def ypass_from(A, v):
        # A: (3, D2, H2, W2) — y pass exactly as advect_split does it
        yi = jnp.arange(1, H + 1, dtype=jnp.float32).reshape(1, H, 1)
        yb = jnp.clip(yi - dtW * v[:, 1:-1, 1:-1], 0.5, H + 0.5)
        At = jnp.swapaxes(A[..., 1:-1], 2, 3)           # (3, D2, W, H2)
        ybt = jnp.swapaxes(yb, 1, 2)                    # (D2, W, H)
        ybt_full = jnp.concatenate(
            [ybt[:, :, :1], ybt, ybt[:, :, -1:]], axis=2)
        b = lane_lerp_stack(At.reshape(3, D2 * W, H2),
                            ybt_full.reshape(D2 * W, H2))
        B = jnp.swapaxes(b.reshape(3, D2, W, H2), 2, 3)  # (3, D2, H2, W)
        return jnp.concatenate([B[..., :1], B, B[..., -1:]], axis=-1)

    def ypass_alone(At, ybt_full):
        # pre-transposed carry: only the kernel, no boundary work
        b = lane_lerp_stack(At.reshape(3, D2 * W, H2),
                            ybt_full.reshape(D2 * W, H2))
        return b.reshape(3, D2, W, H2)

    def timeit(name, body, *args, n=10):
        def run_n(length):
            @jax.jit
            def run(*a):
                def scanbody(c, _):
                    return body(c, *a[1:]), None
                return jax.lax.scan(scanbody, a[0], None, length=length)[0]
            return run
        t = slope(run_n, *args, n=n)
        print(f"{name:24s} {t * 1e3:8.3f} ms", flush=True)
        return t

    tx = timeit("xpass", xpass, stack, vx)
    txy = timeit("xpass+ypass", lambda s, v: ypass_from(xpass(s, v), v),
                 stack, vx)
    At0 = jnp.swapaxes(stack[..., 1:-1], 2, 3)
    yb0 = jnp.clip(jnp.arange(1, H + 1, dtype=jnp.float32).reshape(1, H, 1)
                   - dtW * vx[:, 1:-1, 1:-1], 0.5, H + 0.5)
    ybt0 = jnp.swapaxes(yb0, 1, 2)
    ybt0 = jnp.concatenate([ybt0[:, :, :1], ybt0, ybt0[:, :, -1:]], axis=2)
    ty = timeit("ypass_alone(pretransp)", lambda a, i: ypass_alone(a, i),
                At0, ybt0)
    print(f"boundary cost = {(txy - tx - ty) * 1e3:.3f} ms "
          f"(x+y {txy * 1e3:.3f} - x {tx * 1e3:.3f} - y {ty * 1e3:.3f})")
    return 0


if __name__ == "__main__":
    sys.exit({"probe": probe, "probe3": probe3,
              "boundary": boundary}[sys.argv[1]]())
