from viquae_tpu.native.build import (  # noqa: F401
    load_answer_span_matcher,
    load_bm25_maxscore,
    load_bm25_maxscore_mt,
    load_bm25_scorer,
)
