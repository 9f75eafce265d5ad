"""Pallas TPU kernels for the hot path.

The solver is HBM-bandwidth-bound: 75 relaxation sweeps per step (3x15
velocity diffusion + 2x15 Poisson) each touch the full grid. The XLA path
makes several HBM round trips per sweep (red half, black half, boundary
passes); the kernels here keep the field **resident in VMEM across all
``acc`` sweeps**, turning a 15-sweep solve into one HBM read + one write.
"""

from fluid_simulation_tpu.kernels.linsolve_pallas import (
    pallas_rbgs_solve, pallas_solve_supported)

__all__ = ["pallas_rbgs_solve", "pallas_solve_supported"]
