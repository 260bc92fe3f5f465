from viquae_tpu.viz import html, projection, stats, umap, wtl_filter  # noqa: F401
