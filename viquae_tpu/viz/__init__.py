from viquae_tpu.viz import html, projection, stats, wtl_filter  # noqa: F401
