from mpc_cbf_tpu.ops.qp.canon import box_rows, pad_rows, stack_qp  # noqa: F401
from mpc_cbf_tpu.ops.qp.admm import solve_batch, ADMMConfig  # noqa: F401
from mpc_cbf_tpu.ops.qp.problem import Problem, SolveStatus  # noqa: F401
from mpc_cbf_tpu.ops.qp.ipm import (  # noqa: F401
    HybridIPM, HybridIPMConfig, IPMConfig, StructuredIPM)
