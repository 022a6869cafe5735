"""Ops layer — the TPU-native equivalent of the reference's ``ops.py``.

Everything here is a pure function or a Flax linen module; all state the
reference mutates via TF side effects (SN ``u`` vectors, BN population
stats) lives in explicit Flax variable collections:

- ``params``      — trainable weights
- ``batch_stats`` — BN/cBN population mean/var (ref ``ops.py:~368-400``)
- ``sn_u``        — spectral-norm power-iteration vectors (ref ``ops.py:~403-430``)
"""

from biggan_tpu.ops.activations import lrelu, relu, tanh  # noqa: F401
from biggan_tpu.ops.sn import spectral_normalize  # noqa: F401
from biggan_tpu.ops.layers import SNConv2D, SNConvTranspose2D, SNDense  # noqa: F401
from biggan_tpu.ops.norm import BatchNorm, ConditionalBatchNorm  # noqa: F401
from biggan_tpu.ops.blocks import ResBlock, ResBlockDown, ResBlockUp  # noqa: F401
from biggan_tpu.ops.attn import SelfAttention  # noqa: F401
from biggan_tpu.ops.losses import (  # noqa: F401
    discriminator_loss,
    generator_loss,
    gradient_penalty,
    orthogonal_regularization,
)
from biggan_tpu.ops.pooling import (  # noqa: F401
    avg_pool,
    flatten,
    global_avg_pool,
    global_sum_pool,
    hw_flatten,
    max_pool,
    up_sample,
)
