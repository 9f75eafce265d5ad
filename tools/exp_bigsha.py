#!/usr/bin/env python3
"""Bitwise fingerprint of a 20-step split-mode run at any grid size: SHA of
the final state + density sum. Used to prove big-grid solve plumbing changes
(e.g. the concat reconstruction) are bit-exact end-to-end on the chip.

Usage: python tools/exp_bigsha.py [W H D] [steps]
"""
import hashlib
import sys

import numpy as np


def main():
    args = [int(a) for a in sys.argv[1:]]
    W, H, D = args[:3] if len(args) >= 3 else (256, 128, 128)
    steps = args[3] if len(args) > 3 else 20
    import jax
    import jax.numpy as jnp
    from fluid_simulation_tpu.config import SimParams
    from fluid_simulation_tpu.models.windtunnel import (WindTunnel,
                                                        simulation_step)

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)))())
    params = SimParams(width=W, height=H, depth=D, div_stats=False,
                       mode="split", empty_scene=True)
    wt = WindTunnel(params)

    @jax.jit
    def run(state, m):
        def body(c, _):
            c, _s = simulation_step(c, m, params)
            return c, None
        return jax.lax.scan(body, state, None, length=steps)[0]

    st = run(wt.state, wt.masks)
    jax.block_until_ready(st)
    h = hashlib.sha256()
    for f in st:
        h.update(np.asarray(f).tobytes())
    ds = float(jnp.sum(st.dens, dtype=jnp.float32))
    print(f"{W}x{H}x{D} steps={steps} sha={h.hexdigest()[:16]} "
          f"dens_sum={ds:.6f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
