"""Checkpoint / resume via orbax (SURVEY.md §5 "Checkpoint / resume").

The reference uses ``MovingAverageOptimizer.swapping_saver`` so checkpoints
hold the **EMA** generator weights in the live-variable slots, and encodes
the resume counter in the checkpoint *filename* which ``load()``
regex-parses back (ref BigGAN_128.py:~240, ~270, ~400-430). Here the whole
:class:`~biggan_tpu.training.train_state.GANTrainState` pytree — raw AND
EMA generator params, both optimizer states, SN ``u`` vectors, BN pop
stats, step, rng — is one orbax checkpoint; the step is state, not a
filename. Saves are atomic, pruned to ``keep_n``, and a ``save_on_exit``
hook gives preemption-safe on-demand saving (SIGTERM → save; the fixed-
mesh TPU recovery story per SURVEY §5).
"""

from __future__ import annotations

import os
import signal
from typing import Optional

from typing import TYPE_CHECKING

import jax
import orbax.checkpoint as ocp

if TYPE_CHECKING:  # avoid circular import (training → models → checkpoint)
    from biggan_tpu.training.train_state import GANTrainState


class CheckpointManager:
    def __init__(self, directory: str, keep_n: int = 3, save_interval_steps: int = 1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep_n,
                save_interval_steps=save_interval_steps,
                create=True,
                enable_async_checkpointing=False,
            ),
        )

    def save(self, state: "GANTrainState", step: Optional[int] = None, force: bool = False) -> bool:
        step = int(state.step) if step is None else step
        # _saving guards the SIGTERM fallback: orbax save is not reentrant,
        # so a signal landing mid-save must not start a second save.
        self._saving = True
        try:
            saved = self._mgr.save(
                step, args=ocp.args.StandardSave(jax.tree.map(lambda x: x, state)), force=force
            )
            self._mgr.wait_until_finished()
        finally:
            self._saving = False
        return bool(saved)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, abstract_state: "GANTrainState", step: Optional[int] = None) -> Optional["GANTrainState"]:
        """Restore into the structure/shardings of ``abstract_state``.

        Returns None when no checkpoint exists (ref ``load()`` prints
        " [*] Failed to find a checkpoint" and trains from scratch).
        """
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))

    def install_preemption_hook(self, get_state=None) -> None:
        """SIGTERM → request a save at the next step boundary.

        Saving *inside* the handler is unsafe almost always: the signal
        lands mid-step with high probability (steps run back-to-back), and
        at that moment the caller's state still references buffers donated
        to the running jitted step — ``device_get`` on them raises. So the
        handler only sets :attr:`preemption_requested`; the training loop
        polls it after each completed step, saves a consistent state, and
        calls :meth:`redeliver_sigterm`. This matches how TPU orchestrators
        deliver preemption (SIGTERM, then a grace period ≫ one step).

        ``get_state`` is kept for a best-effort *fallback* save if the
        process is about to die without a cooperating loop (a second
        SIGTERM while one is already pending).
        """
        self._preempt_requested = False
        self._get_state = get_state
        self._loop_active = False

        def _best_effort_save_and_die():
            if getattr(self, "_saving", False):
                # The main thread is mid-save (orbax is not reentrant):
                # don't start a second save from the handler — terminate
                # and let the in-flight atomic save finish or be discarded.
                self.redeliver_sigterm()
                return
            if jax.process_count() > 1:
                # Multi-controller: the orbax save is a COLLECTIVE — a
                # lone process saving from its signal handler would block
                # on cross-host sync forever (its peers are elsewhere, or
                # agreeing on a different step). The deferred cross-host
                # agreement in the train loop is the only safe save path;
                # here just terminate.
                print(" [!] preemption: multi-host fallback save skipped "
                      "(collective save impossible from one process)", flush=True)
                self.redeliver_sigterm()
                return
            try:
                state = self._get_state() if self._get_state else None
                if state is not None:
                    self.save(state, force=True)
            except Exception as e:  # donated buffers / mid-step interrupt
                print(f" [!] preemption save skipped: {e}", flush=True)
            self.redeliver_sigterm()

        def handler(signum, frame):
            if self._preempt_requested or not self._loop_active:
                # Second SIGTERM, or no train loop is polling the flag
                # (eval/test phase, or after train() returned): nothing
                # will ever consume the request — save best-effort NOW and
                # terminate, like the pre-deferred design.
                _best_effort_save_and_die()
                return
            self._preempt_requested = True
            print(" [!] SIGTERM received — will checkpoint at the next step boundary",
                  flush=True)

        signal.signal(signal.SIGTERM, handler)

    def begin_step_polling(self) -> None:
        """The train loop is live and will poll :attr:`preemption_requested`
        after every step — SIGTERM defers to the step boundary."""
        self._loop_active = True

    def end_step_polling(self) -> None:
        self._loop_active = False

    @property
    def preemption_requested(self) -> bool:
        return getattr(self, "_preempt_requested", False)

    def redeliver_sigterm(self) -> None:
        """Restore the default handler and re-deliver SIGTERM (real signal
        semantics for the parent/orchestrator, not SIGINT emulation)."""
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
        os.kill(os.getpid(), signal.SIGTERM)

    def close(self):
        self._mgr.close()
