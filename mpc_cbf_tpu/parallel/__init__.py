from mpc_cbf_tpu.parallel.mesh import (  # noqa: F401
    SCENARIO_AXIS,
    AGENT_AXIS,
    make_mesh,
    scenario_sharding,
    scenario_agent_sharding,
)
from mpc_cbf_tpu.parallel.sim import (  # noqa: F401
    MultiAgentSim,
    SimResult,
    sharded_rollout,
    CBFOnlySim,
    CBFSimResult,
    BezierMPCSim,
)
