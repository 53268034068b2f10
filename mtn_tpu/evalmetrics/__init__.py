from mtn_tpu.evalmetrics.scorer import score_files, score_pairs
from mtn_tpu.evalmetrics.convert import (build_annotation, build_hypotheses,
                                         StopwordFilter)

__all__ = ["score_files", "score_pairs", "build_annotation",
           "build_hypotheses", "StopwordFilter"]
