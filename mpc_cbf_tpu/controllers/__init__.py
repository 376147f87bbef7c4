from mpc_cbf_tpu.controllers.cbf_qp import (  # noqa: F401
    FovCBFController,
    ConnectivityCBFController,
)
from mpc_cbf_tpu.controllers.bezier_mpc import (  # noqa: F401
    BezierParams,
    MPCParams,
    BezierMPCOperator,
    BezierMPC,
)
from mpc_cbf_tpu.controllers.mpc_cbf import (  # noqa: F401
    IMPCParams,
    FovIMPCCBF,
    ConnectivityIMPCCBF,
    BezierMPCCBF,
    StructuredIMPC,
)
