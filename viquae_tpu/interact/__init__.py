from viquae_tpu.interact import system  # noqa: F401
