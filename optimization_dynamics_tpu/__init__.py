"""optimization_dynamics_tpu — TPU-native trajectory optimization with
optimization-based dynamics.

A from-scratch JAX/XLA re-design with the capabilities of
thowell/optimization_dynamics (arXiv:2109.04928) and the Julia engines it
builds on (RoboDojo's interior-point simulator, IterativeLQR's AL-iLQR).
See README.md for the architecture map and docs/DESIGN.md for design
notes.
"""

from optimization_dynamics_tpu.dynamics import (
    ImplicitDynamics,
    ImplicitModel,
    make_implicit_dynamics,
    simulate,
    state_to_configuration,
)
from optimization_dynamics_tpu.ops.cones import ConeSpec, cone_product
from optimization_dynamics_tpu.solver.ilqr import (
    ILQROptions,
    ILQRProblem,
    ILQRResult,
)
from optimization_dynamics_tpu.solver.ilqr import rollout as ilqr_rollout
from optimization_dynamics_tpu.solver.ilqr import solve as ilqr_solve
from optimization_dynamics_tpu.solver.interior_point import (
    IPOptions,
    IPSolution,
    make_sensitivity,
    make_solver,
)

__version__ = "0.1.0"

__all__ = [
    "ImplicitDynamics", "ImplicitModel", "make_implicit_dynamics",
    "simulate", "state_to_configuration",
    "ConeSpec", "cone_product",
    "ILQROptions", "ILQRProblem", "ILQRResult", "ilqr_solve",
    "ilqr_rollout",
    "IPOptions", "IPSolution", "make_solver", "make_sensitivity",
    "__version__",
]
