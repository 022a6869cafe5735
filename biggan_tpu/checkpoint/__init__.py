from biggan_tpu.checkpoint.manager import CheckpointManager  # noqa: F401
