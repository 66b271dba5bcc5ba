from leccr_tpu.data.text import (  # noqa: F401
    normalize_caption,
    parse_caption_file,
    video_id_of,
    build_eval_index,
)
from leccr_tpu.data.tokenizers import WordPieceTokenizer, ClipBPETokenizer  # noqa: F401
from leccr_tpu.data.feature_bank import FeatureBank  # noqa: F401
