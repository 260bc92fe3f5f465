from viquae_tpu.native.build import load_bm25_scorer  # noqa: F401
