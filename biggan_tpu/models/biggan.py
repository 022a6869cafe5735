"""The public ``BigGAN`` class — API parity with the reference.

The reference exposes ``BigGAN_N(sess, args)`` with ``build_model()``,
``train()``, ``test()``, ``generator(z)``, ``discriminator(x)``,
``save()/load()`` and a ``model_dir`` property (ref BigGAN_128.py;
``main.py:~88-110`` drives exactly that surface). This class is the same
surface minus the TF session, over the TPU-native machinery:

- one fused jitted train step (:mod:`biggan_tpu.training.train_step`)
- mesh-sharded batches (GSPMD data parallelism; SURVEY §2.4)
- orbax checkpoint/resume with the step in state, not in a filename
- EMA generator used for all sampling (ref swapping_saver semantics)
- per-iteration stdout line + JSONL/TensorBoard metrics + sample grids,
  the same artifact layout: ``samples/``, ``results/<model_dir>/``,
  ``checkpoint/<model_dir>/``, ``logs/<model_dir>``.

Multi-host: ``train()`` is fully multi-controller (per-process sharded
data feed, collective checkpoints, primary-gated artifacts — see
docs/MULTIHOST.md); the ``test``/``eval``/``sweep`` phases are
single-controller utilities, run on one host against the shared
checkpoint directory.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from biggan_tpu.checkpoint.manager import CheckpointManager
from biggan_tpu.configs.base import GANConfig
from biggan_tpu.data.pipeline import device_prefetch, make_dataset, make_loader
from biggan_tpu.parallel.mesh import create_mesh
from biggan_tpu.parallel.sharding import batch_sharding, shard_state
from biggan_tpu.sampling.grids import save_image_grid
from biggan_tpu.sampling.truncation import sample_z
from biggan_tpu.training.train_state import (
    GANTrainState,
    build_models,
    create_train_state,
    param_count,
)
from biggan_tpu.training.train_step import make_train_step
from biggan_tpu.utils.logging import MetricsLogger, show_all_variables
from biggan_tpu.utils.misc import check_folder


class BigGAN:
    """TPU-native BigGAN with the reference's public surface."""

    def __init__(self, cfg: GANConfig):
        self.cfg = cfg
        self.model_name = cfg.model_name  # "BigGAN"
        self.state: Optional[GANTrainState] = None
        self._built = False
        self._tf_imported = False  # --tf_import weights must survive phase dispatch

    def _maybe_restore(self) -> bool:
        """Restore the latest local checkpoint into state — unless weights
        were explicitly imported from a reference TF checkpoint, which must
        not be silently replaced by whatever is in checkpoint_dir."""
        if self._tf_imported:
            print(" [*] using --tf_import weights (skipping local checkpoint restore)")
            return True
        restored = self.ckpt.restore(self.state)
        if restored is None:
            return False
        self.state = self._shard_state(restored)
        return True

    def _shard_state(self, state):
        """Mesh placement honoring ``--shard_params`` (TP) on every path
        that (re)materializes state: build, local restore, TF import.

        Multi-controller: a leaf committed to one local device cannot be
        device_put onto a sharding spanning other processes' devices
        (cross-host reshard is rejected), but identical HOST values on
        every process can — so pull committed single-device leaves to
        host first. Leaves already on the global mesh (orbax restore)
        pass through untouched.
        """
        if jax.process_count() > 1:
            state = jax.tree.map(
                lambda x: jax.device_get(x)
                if isinstance(x, jax.Array) and len(x.sharding.device_set) == 1
                else x,
                state,
            )
        return shard_state(
            state, self.mesh,
            shard_params=self.cfg.shard_params,
            min_shard_size=self.cfg.tp_min_shard_size,
        )

    def _restore_or_fail(self, what: str) -> None:
        """Restore for a read-only phase (eval/sweep) — and be LOUD when
        there is nothing to restore (ref ``test()`` prints ``[!] Load
        failed``; here random-init metrics are additionally gated behind
        ``--allow_untrained`` so they can't masquerade as results)."""
        if self._maybe_restore():
            print(" [*] Load SUCCESS")
            return
        print(" [!] Load failed — no checkpoint found")
        if not self.cfg.allow_untrained:
            raise RuntimeError(
                f"{what} requested but no checkpoint restored from "
                f"{self.checkpoint_dir!r}; pass --allow_untrained true to "
                f"run against random-init weights anyway"
            )
        print(f" [!] proceeding with untrained weights (--allow_untrained)")

    # ref BigGAN_128.model_dir property (:~385-395)
    @property
    def model_dir(self) -> str:
        return self.cfg.model_dir

    # ------------------------------------------------------------- build
    def build_model(self) -> None:
        """Construct models, mesh, state, and compiled functions
        (ref ``build_model``, BigGAN_128.py:~185-260 — graph construction)."""
        cfg = self.cfg
        if cfg.debug_nans:
            jax.config.update("jax_debug_nans", True)
        self.generator_net, self.discriminator_net = build_models(cfg)
        self.mesh = create_mesh(cfg.mesh_shape, cfg.mesh_axes, num_slices=cfg.num_slices)
        self._data_sharding = batch_sharding(self.mesh, batch_dim=1)
        # multi-controller: every process runs the same SPMD program, but
        # only the primary writes artifacts (logs, samples, config.json)
        self._is_primary = jax.process_index() == 0

        # local_devices, not devices: in multi-controller the global list's
        # first device belongs to process 0 and is non-addressable elsewhere
        with jax.default_device(jax.local_devices()[0]):
            state = create_train_state(cfg, jax.random.PRNGKey(cfg.seed))
        self.state = self._shard_state(state)

        self._train_step = jax.jit(make_train_step(cfg), donate_argnums=0)

        # eval/sampling head: EMA params, population stats, no state updates
        # (ref ``self.fake_images = generator(z, is_training=False, reuse=True)``)
        def _sample(g_ema_params, g_state, z, labels):
            variables = {"params": g_ema_params, **g_state}
            return self.generator_net.apply(variables, z, labels, train=False)

        self._sample_fn = jax.jit(_sample)

        # run-dir layout matches the reference artifact tree
        self.checkpoint_dir = check_folder(os.path.join(cfg.checkpoint_dir, self.model_dir))
        self.sample_dir = check_folder(cfg.sample_dir)
        self.result_dir = check_folder(os.path.join(cfg.result_dir, self.model_dir))
        self.log_path = check_folder(os.path.join(cfg.log_dir, self.model_dir))
        if self._is_primary:
            with open(os.path.join(self.log_path, "config.json"), "w") as f:
                f.write(cfg.to_json())

        self.ckpt = CheckpointManager(self.checkpoint_dir, keep_n=cfg.ckpt_keep_n)
        if self._is_primary:
            show_all_variables("generator", self.state.g_params)
            show_all_variables("discriminator", self.state.d_params)
        self._built = True

    def _require_built(self):
        if not self._built:
            raise RuntimeError("call build_model() first (reference API contract)")

    # ------------------------------------------------------------- train
    def train(self) -> None:
        """The training loop (ref ``train``, BigGAN_128.py:~265-340)."""
        self._require_built()
        cfg = self.cfg

        # resume (ref load() → counter parsing; here step lives in state)
        if self._maybe_restore():
            print(f" [*] Load SUCCESS — resuming from step {int(self.state.step)}")
            start_step = int(self.state.step)
        else:
            print(" [!] Load failed — training from scratch")
            start_step = 0

        source = make_dataset(
            cfg.dataset, cfg.img_size, cfg.num_classes, cfg.seed,
            data_root=cfg.data_root, sampling=cfg.data_sampling,
        )
        # resume the epoch-shuffle traversal where the restored step left it
        # (ref resumes epoch/idx from the ckpt counter, BigGAN_128.py:~272-278)
        n_proc = jax.process_count()
        start_images = start_step * cfg.n_critic * cfg.batch_size
        if n_proc > 1 or cfg.data_loader == "ordered":
            # multi-host (or explicitly ordered) feed: every process
            # decodes only ITS slice of the deterministic global batch k
            # and make_array_from_process_local_data assembles the global
            # array — no whole-batch device_put, no divergent queues.
            if cfg.batch_size % n_proc:
                raise ValueError(
                    f"global batch_size {cfg.batch_size} must divide by the "
                    f"process count {n_proc} (per-process data feed)"
                )
            loader = make_loader(
                source, cfg.batch_size // n_proc, cfg.n_critic, seed=cfg.seed,
                start_count=start_images,
                shard=(jax.process_index(), n_proc),
            )
        else:
            loader = make_loader(
                source, cfg.batch_size, cfg.n_critic, seed=cfg.seed,
                start_count=start_images,
            )
        batches = device_prefetch(loader, self._data_sharding, process_local=n_proc > 1)
        logger = MetricsLogger(self.log_path) if self._is_primary else None
        self.ckpt.install_preemption_hook(lambda: self.state)

        # fixed z/labels for the periodic sample grid (comparable across
        # steps). Replicated over the mesh via host values: a committed
        # single-device array cannot feed a jit spanning a multi-process
        # mesh; identical host values on every process can (and the seeds
        # make them identical).
        from jax.sharding import NamedSharding, PartitionSpec

        repl = NamedSharding(self.mesh, PartitionSpec())
        vis_z_rng, vis_label_rng = jax.random.split(jax.random.PRNGKey(cfg.seed + 1))
        self._vis_z = jax.device_put(
            np.asarray(sample_z(vis_z_rng, (cfg.sample_num, cfg.z_dim), "truncated", cfg.truncation)),
            repl,
        )
        self._vis_labels = (
            jax.device_put(
                np.asarray(jax.random.randint(vis_label_rng, (cfg.sample_num,), 0, cfg.num_classes)),
                repl,
            )
            if cfg.num_classes > 0
            else None
        )

        total_steps = cfg.epoch * cfg.iteration
        step = start_step
        preempted = False
        self.ckpt.begin_step_polling()  # SIGTERM now defers to step boundaries
        # profiler trace window: skip the first (compile) step, then
        # capture cfg.profile_steps steps into logs/<model_dir>/profile
        profile_start = start_step + 2 if cfg.profile_steps > 0 else -1
        profile_stop = profile_start + cfg.profile_steps
        interval_start_step, interval_start_time = step, time.time()
        try:
            while step < total_steps:
                if step == profile_start:
                    jax.profiler.start_trace(os.path.join(self.log_path, "profile"))
                t0 = time.time()
                batch = next(batches)  # already on device (double-buffered)
                self.state, metrics = self._train_step(self.state, batch)
                step += 1
                if step == profile_stop:
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()
                    print(f" [*] wrote profiler trace ({cfg.profile_steps} steps)")

                if self._preemption_agreed(step, n_proc):
                    # SIGTERM landed mid-step; now the state is consistent
                    # (no donated buffers in flight) — save and terminate
                    print(" [!] preemption: checkpointing at step boundary", flush=True)
                    self.save()
                    preempted = True
                    break

                if step % cfg.print_freq == 0 or step == start_step + 1:
                    # steady-state throughput, completion-to-completion:
                    # the clock stops AFTER this step's metrics
                    # materialize (so dispatched-but-running steps are
                    # fully paid for) and restarts after logging/sampling,
                    # so the logging stall itself is excluded.
                    steady_steps = step - interval_start_step
                    metrics = jax.device_get(metrics)
                    t_done = time.time()
                    if cfg.log_sigma:
                        # computed on ALL processes (jitted over global
                        # state — SPMD programs need every controller)
                        sig = jax.device_get(self._sigma_metrics())
                        metrics.update(sig)
                        if logger is not None:
                            # σ(W) distribution per net (SURVEY §5 histograms)
                            for net in ("g", "d"):
                                logger.log_histogram(
                                    step, f"{net}_sigma",
                                    [v for k, v in sig.items() if k.startswith(f"{net}_sigma/")],
                                )
                    dt = time.time() - t0
                    imgs_per_sec = (
                        steady_steps * cfg.batch_size * cfg.n_critic
                        / max(t_done - interval_start_time, 1e-9)
                    )
                    epoch, idx = divmod(step - 1, cfg.iteration)
                    if logger is not None:
                        logger.print_iter(epoch, idx + 1, cfg.iteration, dt, metrics, imgs_per_sec)
                        logger.log(step, {**metrics, "images_per_sec": imgs_per_sec})
                    self._write_train_samples(step)
                    interval_start_step, interval_start_time = step, time.time()
                if step % cfg.save_freq == 0:
                    self.save()
                    # checkpoint time must not deflate the next interval
                    interval_start_step, interval_start_time = step, time.time()
        finally:
            self.ckpt.end_step_polling()  # outside the loop SIGTERM saves immediately
            loader.close()
            if logger is not None:
                logger.close()
        if preempted:
            self.ckpt.redeliver_sigterm()  # terminate with real SIGTERM status
        self.save()
        print(" [*] Training finished")

    # every 16 steps ≈ seconds of response latency at flagship step times,
    # amortizing the host barrier the agreement costs (multi-host only)
    _PREEMPT_POLL_EVERY = 16

    def _preemption_agreed(self, step: int, n_proc: int) -> bool:
        """Whether to checkpoint-and-exit for preemption at this boundary.

        Single-controller: the local SIGTERM flag, checked every step.
        Multi-controller: the checkpoint save is a COLLECTIVE — if one
        process saves at step k while another (whose SIGTERM landed a step
        later) saves at k+1, the save deadlocks. So processes agree by
        all-gathering their local flags at a fixed step cadence; any
        flagged process ⇒ all save at the same boundary. The cadence
        bounds the extra host-sync cost; orchestrator grace periods
        (30s+) dwarf 16 steps.
        """
        if n_proc == 1:
            return self.ckpt.preemption_requested
        if step % self._PREEMPT_POLL_EVERY:
            return False
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([self.ckpt.preemption_requested])
        )
        return bool(np.any(flags))

    def _sigma_metrics(self) -> dict:
        from biggan_tpu.ops.sn import sigma_metrics

        @jax.jit
        def compute(g_params, g_sn, d_params, d_sn):
            return {
                **sigma_metrics(g_params, g_sn, "g_"),
                **sigma_metrics(d_params, d_sn, "d_"),
            }

        return compute(
            self.state.g_params, self.state.g_state.get("sn_u", {}),
            self.state.d_params, self.state.d_state.get("sn_u", {}),
        )

    def _write_train_samples(self, step: int) -> None:
        cfg = self.cfg
        # all processes run the jitted sample (SPMD); only primary writes
        imgs = self._sample_fn(
            self.state.g_ema_params, self.state.g_state, self._vis_z, self._vis_labels
        )
        if not self._is_primary:
            return
        epoch, idx = divmod(step - 1, cfg.iteration)
        path = os.path.join(
            self.sample_dir, f"{self.model_name}_train_{epoch:02d}_{idx + 1:05d}.png"
        )
        save_image_grid(np.asarray(jax.device_get(imgs)), path)

    # -------------------------------------------------------------- test
    def test(self) -> None:
        """Inference sampling (ref ``test``, BigGAN_128.py:~345-380):
        restore (EMA weights), draw truncated z, write PNG grids."""
        self._require_built()
        cfg = self.cfg
        if self._maybe_restore():
            print(" [*] Load SUCCESS")
        else:
            print(" [!] Load failed — sampling from untrained weights")

        rng = jax.random.PRNGKey(cfg.seed + 2)
        for i in range(cfg.test_num):
            rng, z_rng, l_rng = jax.random.split(rng, 3)
            imgs = self.sample(cfg.sample_num, rng=z_rng, label_rng=l_rng)
            path = os.path.join(self.result_dir, f"{self.model_name}_test_{i}.png")
            save_image_grid(np.asarray(imgs), path)
            print(f" [*] wrote {path}")

    def truncation_sweep(
        self,
        psis=(0.2, 0.4, 0.6, 0.8, 1.0),
        n: Optional[int] = None,
    ) -> list:
        """Fidelity↔variety sweep over the truncation ψ (SURVEY §7 step 7;
        the BigGAN paper's signature figure). One grid per ψ with the SAME
        z and labels, so rows are directly comparable: small ψ collapses
        toward the class modes, ψ=1 is the untruncated prior. Returns the
        written paths."""
        self._require_built()
        cfg = self.cfg
        self._restore_or_fail("truncation sweep")
        n = cfg.sample_num if n is None else n
        z_rng, l_rng = jax.random.split(jax.random.PRNGKey(cfg.seed + 3))
        labels = (
            jax.random.randint(l_rng, (n,), 0, cfg.num_classes)
            if cfg.num_classes > 0
            else None
        )
        paths = []
        for psi in psis:
            imgs = self.sample(n, psi=psi, labels=labels, rng=z_rng)
            path = os.path.join(
                self.result_dir, f"{self.model_name}_truncation_psi{psi:.2f}.png"
            )
            save_image_grid(np.asarray(imgs), path)
            paths.append(path)
            print(f" [*] wrote {path}")
        return paths

    def sample(
        self,
        n: int,
        psi: Optional[float] = None,
        labels: Optional[jax.Array] = None,
        rng: Optional[jax.Array] = None,
        label_rng: Optional[jax.Array] = None,
    ) -> np.ndarray:
        """Truncation-trick sampling from the EMA generator.

        Without an explicit ``rng`` each call draws fresh (wall-clock-
        seeded, i.e. non-reproducible) z — the reference's `test()`
        behavior, where z is a graph op re-sampled per ``sess.run``
        (ref BigGAN_128.py:~345-380). Pass ``rng`` for determinism.
        """
        self._require_built()
        cfg = self.cfg
        rng = jax.random.PRNGKey(int(time.time())) if rng is None else rng
        psi = cfg.truncation_psi if psi is None else psi
        z_rng, default_label_rng = jax.random.split(rng)  # never reuse a key
        z = sample_z(z_rng, (n, cfg.z_dim), "truncated", cfg.truncation, psi)
        if cfg.num_classes > 0 and labels is None:
            label_rng = default_label_rng if label_rng is None else label_rng
            labels = jax.random.randint(label_rng, (n,), 0, cfg.num_classes)
        imgs = self._sample_fn(self.state.g_ema_params, self.state.g_state, z, labels)
        return np.asarray(jax.device_get(imgs))

    # -------------------------------------------------------------- eval
    def evaluate(self, num_samples: Optional[int] = None) -> dict:
        """FID + Inception Score for the EMA generator vs the dataset
        (new capability — the reference has no quantitative eval)."""
        self._require_built()
        self._restore_or_fail("eval")
        from biggan_tpu.eval.harness import evaluate_gan

        return evaluate_gan(
            self, num_samples or self.cfg.eval_num, seed=self.cfg.seed
        )

    # ---------------------------------------------------- direct forwards
    def generator(self, z, labels=None, is_training: bool = False, ema: bool = True):
        """Raw generator forward (ref ``generator``, BigGAN_128.py:~65-110)."""
        self._require_built()
        params = self.state.g_ema_params if ema else self.state.g_params
        variables = {"params": params, **self.state.g_state}
        if is_training:
            out, _ = self.generator_net.apply(
                variables, z, labels, train=True, mutable=["batch_stats", "sn_u"]
            )
            return out
        return self.generator_net.apply(variables, z, labels, train=False)

    def discriminator(self, x, labels=None, is_training: bool = False):
        """Raw discriminator forward (ref ``discriminator``, :~115-150)."""
        self._require_built()
        variables = {"params": self.state.d_params, **self.state.d_state}
        if is_training:
            out, _ = self.discriminator_net.apply(
                variables, x, labels, train=True, mutable=["batch_stats", "sn_u"]
            )
            return out
        return self.discriminator_net.apply(variables, x, labels, train=False)

    # --------------------------------------------------------- save/load
    def save(self) -> None:
        self._require_built()
        if jax.process_count() > 1:
            # distributed save: EVERY process calls in (orbax coordinates
            # shard writes + the primary-host finalize); device_get of a
            # cross-host array is neither possible nor needed here
            self.ckpt.save(self.state)
        else:
            self.ckpt.save(jax.device_get(self.state))
        if self._is_primary:
            print(f" [*] Saved checkpoint at step {int(self.state.step)}")

    def load_tf_checkpoint(self, ckpt_path: str, strict: bool = False) -> None:
        """Import a reference BigGAN-Tensorflow checkpoint (SURVEY §5):
        EMA generator weights land in both raw and EMA slots
        (swapping_saver semantics), SN u / BN stats included."""
        self._require_built()
        from biggan_tpu.checkpoint.tf_import import import_tf_checkpoint

        host_state = jax.device_get(self.state)
        new_state, report = import_tf_checkpoint(
            ckpt_path, host_state, strict=strict, img_size=self.cfg.img_size
        )
        self.state = self._shard_state(new_state)
        self._tf_imported = True
        print(f" [*] TF checkpoint imported: {report.summary()}")
        if report.unmatched_tree:
            print(f" [!] unmatched pytree leaves: {report.unmatched_tree[:5]} ...")

    def load(self) -> bool:
        self._require_built()
        restored = self.ckpt.restore(self.state)
        if restored is None:
            return False
        self.state = self._shard_state(restored)
        return True

    @property
    def num_params(self) -> dict:
        self._require_built()
        return {
            "generator": param_count(self.state.g_params),
            "discriminator": param_count(self.state.d_params),
        }
