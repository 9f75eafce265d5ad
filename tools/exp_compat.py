#!/usr/bin/env python3
"""Decompose the compat-mode step cost (VERDICT r2 #2).

Times: the full compat step, one compat advect, the (N,8)-table build
alone, the gather alone, and the lerp combine alone — to locate the
irreducible XLA-gather floor vs removable glue.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.models.windtunnel import WindTunnel, simulation_step
    from fluid_simulation_tpu.ops.advect import advect, backtrace

    W, H, D = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (128, 64, 64)
    n = 20
    params = SimParams(width=W, height=H, depth=D, div_stats=False,
                       mode="compat", empty_scene=True)
    wt = WindTunnel(params)
    masks = wt.masks
    p = wt.params
    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    st, _ = jax.jit(simulation_step, static_argnames=("params",))(
        wt.state, masks, p)
    state = st

    def timeit(name, body, init):
        def run_n(length):
            @jax.jit
            def run(c, m):
                return jax.lax.scan(lambda c, _: (body(c, m), None), c, None,
                                    length=length)[0]
            return run
        r1, r3 = run_n(n), run_n(3 * n)
        jax.block_until_ready(r1(init, masks))
        jax.block_until_ready(r3(init, masks))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(r1(init, masks))
            t1 = time.perf_counter()
            jax.block_until_ready(r3(init, masks))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n))
        print(f"{name:28s} {best * 1e3:8.3f} ms", flush=True)
        return best

    timeit("full_compat_step", lambda s, m: simulation_step(s, m, p)[0], state)

    def adv1(s, m):
        vx = advect(1, s.vx, s.vx, s.vy, s.vz, m, p.dt, p.wall_mode,
                    p.empty_scene)
        return s._replace(vx=vx)
    timeit("compat_advect_x1 (4)", adv1, state)

    # pieces: table build / gather / lerp
    D2, H2, W2 = p.padded_shape
    sy_, sz_ = W2, W2 * H2
    offsets = (0, 1, sy_, sy_ + 1, sz_, sz_ + 1, sz_ + sy_, sz_ + sy_ + 1)

    def table_only(s, m):
        flat = s.vx.reshape(-1)
        tbl = jnp.stack([jnp.roll(flat, -d) for d in offsets], axis=1)
        return s._replace(vx=(tbl[:, 0] - tbl[:, 7]).reshape(s.vx.shape))
    timeit("table_build_x1", table_only, state)

    def gather_only(s, m):
        vx_i = s.vx[1:-1, 1:-1, 1:-1]
        xb, yb, zb = backtrace(vx_i, s.vy[1:-1, 1:-1, 1:-1],
                               s.vz[1:-1, 1:-1, 1:-1], p.dt,
                               p.width, p.height, p.depth, s.vx.dtype)
        i0 = jnp.floor(xb).astype(jnp.int32)
        j0 = jnp.floor(yb).astype(jnp.int32)
        k0 = jnp.floor(zb).astype(jnp.int32)
        flat = s.vx.reshape(-1)
        tbl = jnp.stack([jnp.roll(flat, -d) for d in offsets], axis=1)
        base = jnp.clip(k0 * sz_ + j0 * sy_ + i0, 0, flat.shape[0] - 1)
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
        g = lax.gather(tbl, base.reshape(-1, 1), dnums, slice_sizes=(1, 8),
                       mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        out = jnp.zeros_like(s.vx).at[1:-1, 1:-1, 1:-1].set(
            g[:, 0].reshape(i0.shape))
        return s._replace(vx=out)
    timeit("backtrace+table+gather_x1", gather_only, state)

    return 0


if __name__ == "__main__":
    sys.exit(main())
