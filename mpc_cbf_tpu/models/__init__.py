from mpc_cbf_tpu.models.double_integrator import (  # noqa: F401
    DoubleIntegrator,
    double_integrator_xyyaw,
)
