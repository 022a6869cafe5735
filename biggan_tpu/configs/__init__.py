from biggan_tpu.configs.base import GANConfig, get_config, list_configs  # noqa: F401
