"""mpc_cbf_tpu — a TPU-native multi-agent MPC-CBF framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
C++ stack ``ywang760/mpc-cbf`` (Eigen + GiNaC symbolics + CPLEX), redesigned
for TPU hardware:

- GiNaC symbolic Lie derivatives  -> JAX autodiff CBF engine (:mod:`.ops.cbf`)
- CPLEX QP solver                 -> batched ADMM solver, jnp + Pallas
  (:mod:`.ops.qp`)
- Eigen linear algebra            -> precomputed static operators
  (:mod:`.ops.bernstein`, :mod:`.models.double_integrator`)
- sequential per-robot loops      -> vmapped agent axis
- bash-level scenario scale-out   -> sharded scenario axis over a device mesh
  (:mod:`.parallel`)

Layer map (mirrors reference layers L0-L7, see SURVEY.md §1):

=====  ==============================  =============================
Layer  Reference                       Here
=====  ==============================  =============================
L0     math/, common/                  ops/geometry.py, utils/
L1     qpcpp + CPLEX                   ops/qp/ (batched ADMM)
L2     cbf/detail, splines, model      ops/cbf.py, ops/bernstein.py,
                                       models/double_integrator.py
L3/L4  *QPOperations/*QPGenerator      controllers/*_assembly
L5     controllers                     controllers/
L6     examples mains                  parallel/sim.py
L7     experiments harness             utils/metrics.py, bench.py
=====  ==============================  =============================
"""

__version__ = "0.1.0"

from mpc_cbf_tpu import models, ops, controllers, parallel, utils  # noqa: F401
