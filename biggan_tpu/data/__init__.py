from biggan_tpu.data.pipeline import make_dataset  # noqa: F401
