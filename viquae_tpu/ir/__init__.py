from viquae_tpu.ir import metrics, search  # noqa: F401
