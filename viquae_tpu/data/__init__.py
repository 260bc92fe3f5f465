from viquae_tpu.data import loading  # noqa: F401
