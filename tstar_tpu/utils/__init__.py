from tstar_tpu.utils.config import SearchConfig, FrameworkConfig  # noqa: F401
