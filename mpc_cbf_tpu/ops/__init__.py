from mpc_cbf_tpu.ops import bernstein, geometry, cbf, collision_shapes  # noqa: F401
from mpc_cbf_tpu.ops import qp  # noqa: F401
