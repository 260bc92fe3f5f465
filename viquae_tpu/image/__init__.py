from viquae_tpu.image import embedding, resize  # noqa: F401
