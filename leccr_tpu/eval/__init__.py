from leccr_tpu.eval.retrieval import (  # noqa: F401
    itm_metrics_from_ranks,
    retrieval_ranks,
    retrieval_metrics,
    score_matrix,
)
