from leccr_tpu.models.clip import CLIPVisionTower, CLIPTextTower, CLIP_VARIANTS  # noqa: F401
from leccr_tpu.models.bert import BertEncoder  # noqa: F401
from leccr_tpu.models.temporal import TemporalTower  # noqa: F401
from leccr_tpu.models.leccr import LECCRModel  # noqa: F401
