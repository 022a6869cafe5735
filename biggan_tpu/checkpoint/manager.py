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
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(jax.tree.map(lambda x: x, state)), force=force
        )
        self._mgr.wait_until_finished()
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

    def install_preemption_hook(self, get_state) -> None:
        """SIGTERM → best-effort synchronous save, then default termination.

        The save is best-effort because the signal can land mid-step while
        the caller's state still references buffers donated to the running
        jitted step — ``device_get`` on those raises; in that case we skip
        the save (the previous periodic checkpoint remains valid) rather
        than crash inside the handler. Termination is then re-delivered as
        a real SIGTERM (not SIGINT semantics).
        """

        def handler(signum, frame):
            try:
                state = get_state()
                if state is not None:
                    self.save(state, force=True)
            except Exception as e:  # donated buffers / mid-step interrupt
                print(f" [!] preemption save skipped: {e}", flush=True)
            signal.signal(signal.SIGTERM, signal.SIG_DFL)
            os.kill(os.getpid(), signal.SIGTERM)

        signal.signal(signal.SIGTERM, handler)

    def close(self):
        self._mgr.close()
