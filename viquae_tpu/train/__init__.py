from viquae_tpu.train import metrics, objectives, optim  # noqa: F401
