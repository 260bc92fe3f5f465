from viquae_tpu.ops import mips, packing  # noqa: F401
