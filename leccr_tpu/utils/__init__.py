from leccr_tpu.utils.profiling import trace_context, step_timer  # noqa: F401
from leccr_tpu.utils.debug import enable_nan_checks, assert_all_finite  # noqa: F401
