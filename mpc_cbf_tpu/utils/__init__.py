from mpc_cbf_tpu.utils import metrics, config, instances  # noqa: F401
