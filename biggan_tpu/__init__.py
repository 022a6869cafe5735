"""biggan_tpu — a TPU-native JAX re-design of BigGAN-Tensorflow.

A brand-new framework with the capabilities of ``david-jk/BigGAN-Tensorflow``
(see SURVEY.md for the component inventory), built TPU-first:

- compute path: JAX / XLA, ``jit`` + ``jax.sharding.Mesh`` (GSPMD), Pallas
  kernels for the hot attention / power-iteration ops
- single parameterized BigGAN model covering 32..512 px (replaces the
  reference's three copy-pasted ``BigGAN_{128,256,512}.py`` files)
- explicit functional state: spectral-norm ``u`` vectors, BN population
  stats, and the EMA generator are carried pytree state threaded through one
  fused, jitted D-then-G train step (the reference mutates them as TF graph
  side effects; ref ``ops.py:~403-430``, ``BigGAN_128.py:~240``).

Public API mirrors the reference's ``BigGAN`` class
(``build_model`` / ``train`` / ``test``; ref ``main.py:~88-110``).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy import so `import biggan_tpu` stays cheap (no jax/flax import cost).
    if name == "BigGAN":
        from biggan_tpu.models.biggan import BigGAN

        return BigGAN
    raise AttributeError(name)
