from viquae_tpu.core import config, mesh, prng  # noqa: F401
