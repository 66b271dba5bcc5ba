from leccr_tpu.train.optim import build_optimizer, classify_params  # noqa: F401
from leccr_tpu.train.schedule import linear_warmup_decay, resolve_warmup  # noqa: F401
