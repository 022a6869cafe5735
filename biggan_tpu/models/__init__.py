from biggan_tpu.models.arch import ARCH_TABLE, ArchSpec  # noqa: F401
from biggan_tpu.models.nets import Discriminator, Generator  # noqa: F401


def __getattr__(name):
    # BigGAN pulls in the training stack; lazy to break the import cycle
    # (training.train_state → models.nets → models/__init__ → biggan → training).
    if name == "BigGAN":
        from biggan_tpu.models.biggan import BigGAN

        return BigGAN
    raise AttributeError(name)
