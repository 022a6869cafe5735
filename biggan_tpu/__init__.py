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

import os as _os


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache (TPU backends only).

    The axon TPU backend compiles through a remote service where a cold
    compile of the fused train step takes many minutes; the persistent
    cache makes every later process (CLI runs, bench.py, the driver's
    compile checks) a disk hit. On CPU the cache can load AOT results
    whose recorded machine features differ from the host and perturb
    numerics, so it stays off there (and CPU compiles are fast anyway).

    Called from ``build_models`` — every model-construction path funnels
    through it — so importing the package stays cheap. Safe to call
    multiple times.
    """
    import jax

    if jax.config.jax_compilation_cache_dir:
        return
    if jax.default_backend() == "cpu":
        return
    path = path or _os.environ.get(
        "BIGGAN_TPU_COMPILE_CACHE",
        _os.path.join(_os.path.expanduser("~"), ".cache", "biggan_tpu_xla"),
    )
    _os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def __getattr__(name):
    # Lazy import so `import biggan_tpu` stays cheap (no jax/flax import cost).
    if name == "BigGAN":
        from biggan_tpu.models.biggan import BigGAN

        return BigGAN
    raise AttributeError(name)
