"""Fused vorticity-confinement kernel (Pallas TPU) for <=VMEM grids.

ops/vorticity.py's confinement force is ~15 XLA passes (two curls, a
magnitude, its gradient, a normalize, a cross product) whose stencil shifts
block full fusion — ~0.4 ms of the 1.40 ms noslip+vorticity flagship step.
This kernel computes the whole update in one VMEM-resident pass: velocities
in (aliased out), keep_vel interior in, interior += eps*dt*keep*(N x omega).

Numerics mirror ops/vorticity.py::confinement_force expression-for-
expression (same operand order, same 1e-5 epsilon, the same zero ghost
shell on the |omega| gradient via iota-edge selects); the jnp path is the
oracle in tests. Vorticity confinement is an extension over the reference
(BASELINE config 3) — there is no bit-level reference contract here, but
the kernel is written to match the oracle exactly anyway.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluid_simulation_tpu.kernels.linsolve_pallas import (
    VMEM_BUDGET_BYTES, _itemsize, _tiled_bytes, _roll)


def pallas_confinement_supported(shape, dtype=jnp.float32) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if len(shape) != 3 or min(shape) < 4:
        return False
    it = _itemsize(dtype)
    interior = tuple(n - 2 for n in shape)
    # 3 aliased velocities + keep + ~10 live interior temporaries (curl,
    # mag, gradient, normal, force)
    return (3 * _tiled_bytes(shape, it)
            + 11 * _tiled_bytes(interior, it)) <= VMEM_BUDGET_BYTES


def _make_confinement_kernel(shape, eps: float, dt: float, dtype):
    D2, H2, W2 = shape
    D, H, W = D2 - 2, H2 - 2, W2 - 2
    s_lit = float(np.float32(eps) * np.float32(dt))

    def kernel(kv_ref, vxo, vyo, vzo):
        vx, vy, vz = vxo[...], vyo[...], vzo[...]
        half = jnp.asarray(0.5, dtype)

        def cz(f):
            return half * (f[2:, 1:-1, 1:-1] - f[:-2, 1:-1, 1:-1])

        def cy(f):
            return half * (f[1:-1, 2:, 1:-1] - f[1:-1, :-2, 1:-1])

        def cx(f):
            return half * (f[1:-1, 1:-1, 2:] - f[1:-1, 1:-1, :-2])

        # omega = curl(v) on the interior (ops/vorticity.py order)
        wx = cy(vz) - cz(vy)
        wy = cz(vx) - cx(vz)
        wz = cx(vy) - cy(vx)
        mag = jnp.sqrt(wx * wx + wy * wy + wz * wz)

        # central differences of |omega| with the oracle's zero ghost shell
        ix = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 2)
        iy = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 1)
        iz = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 0)
        zero = jnp.zeros((D, H, W), dtype)
        gx = half * (jnp.where(ix < W - 1, _roll(mag, W - 1, 2), zero)
                     - jnp.where(ix > 0, _roll(mag, 1, 2), zero))
        gy = half * (jnp.where(iy < H - 1, _roll(mag, H - 1, 1), zero)
                     - jnp.where(iy > 0, _roll(mag, 1, 1), zero))
        gz = half * (jnp.where(
            iz < D - 1, jnp.concatenate([mag[1:], mag[:1]], axis=0), zero)
            - jnp.where(iz > 0,
                        jnp.concatenate([mag[D - 1:], mag[:D - 1]], axis=0),
                        zero))
        norm = jnp.sqrt(gx * gx + gy * gy + gz * gz) + jnp.asarray(1e-5,
                                                                   dtype)
        nx, ny, nz = gx / norm, gy / norm, gz / norm

        s = jnp.asarray(s_lit, dtype) * kv_ref[...]
        vxo[1:-1, 1:-1, 1:-1] = vx[1:-1, 1:-1, 1:-1] + s * (ny * wz - nz * wy)
        vyo[1:-1, 1:-1, 1:-1] = vy[1:-1, 1:-1, 1:-1] + s * (nz * wx - nx * wz)
        vzo[1:-1, 1:-1, 1:-1] = vz[1:-1, 1:-1, 1:-1] + s * (nx * wy - ny * wx)

    def entry(vx_ref, vy_ref, vz_ref, kv_ref, vxo, vyo, vzo):
        vxo[...] = vx_ref[...]
        vyo[...] = vy_ref[...]
        vzo[...] = vz_ref[...]
        kernel(kv_ref, vxo, vyo, vzo)

    return entry


@functools.partial(jax.jit, static_argnames=("eps", "dt", "interpret"))
def pallas_confinement(vx, vy, vz, keep_vel_i, eps: float, dt: float,
                       interpret: bool = False):
    """Drop-in for ``ops.vorticity.apply_confinement`` (whole padded fields
    in/out; faces untouched, exactly the oracle's interior-only add).
    ``keep_vel_i`` is the interior keep mask (ones for empty scenes)."""
    shape = vx.shape
    kernel = _make_confinement_kernel(shape, eps, dt, vx.dtype)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES)
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(shape, vx.dtype)] * 3,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        input_output_aliases={0: 0, 1: 1, 2: 2},
        interpret=interpret,
        **kwargs,
    )(vx, vy, vz, keep_vel_i.astype(vx.dtype))
