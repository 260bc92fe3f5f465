from viquae_tpu.ops import mips  # noqa: F401
