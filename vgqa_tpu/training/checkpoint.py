"""Checkpoint manager (orbax).

Parity with ``VSTGCheckpointer``
(/root/reference/vgqa/utils/checkpoint_manager.py:27-203): periodic
``model_{step:06d}`` saves plus a ``last_checkpoint`` tag file, auto-resume
from the tag on train start, and eval-time loading of a specific weight
file. Torch-pickle .pth files are replaced with orbax's async-capable,
sharding-aware format (restores place arrays directly onto the mesh).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, output_dir: str, save_to_disk: bool = True, logger=None):
        self.output_dir = os.path.abspath(output_dir)
        self.save_to_disk = save_to_disk
        self.logger = logger
        self._ckpt = ocp.StandardCheckpointer()
        if save_to_disk:
            os.makedirs(self.output_dir, exist_ok=True)

    # -- tag file (parity with checkpoint_manager.py:95-108) ---------------
    @property
    def _tag_path(self) -> str:
        return os.path.join(self.output_dir, "last_checkpoint")

    def has_checkpoint(self) -> bool:
        return os.path.exists(self._tag_path)

    def get_checkpoint_file(self) -> str:
        try:
            with open(self._tag_path) as f:
                return f.read().strip()
        except OSError:
            return ""

    def _tag_last_checkpoint(self, path: str) -> None:
        with open(self._tag_path, "w") as f:
            f.write(path)

    # -- save/load ---------------------------------------------------------
    def save(self, name: str, state: Any, tag: bool = True) -> Optional[str]:
        """Save ``state`` under ``name``; ``tag=False`` skips re-pointing the
        ``last_checkpoint`` tag (used for params-only eval twins, which are
        not resumable TrainStates and must never become the resume target).
        """
        if not self.save_to_disk:
            return None
        path = os.path.join(self.output_dir, name)
        if self.logger:
            self.logger.info(f"Saving checkpoint to {path}")
        self._ckpt.save(path, state, force=True)
        self._ckpt.wait_until_finished()
        if tag:
            self._tag_last_checkpoint(path)
        return path

    def load(self, abstract_state: Any, path: str = "") -> Any:
        """Restore into the structure/shardings of ``abstract_state``.

        With no explicit path, resumes from the tag file if present
        (parity with checkpoint_manager.py:79-93); returns None when there
        is nothing to load.
        """
        if not path:
            if not self.has_checkpoint():
                return None
            path = self.get_checkpoint_file()
        if not path or not os.path.exists(path):
            return None
        if self.logger:
            self.logger.info(f"Loading checkpoint from {path}")
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
        return self._ckpt.restore(path, target=target)

    def load_saved(self, path: str) -> Any:
        """Restore a checkpoint in its own saved structure (no template).

        Needed when the on-disk tree legitimately differs from any
        in-memory template — e.g. quantized QA weight dirs whose layers
        hold ``kernel_q``/``kernel_q4``+scales instead of ``kernel``
        (tools/convert_weights.py qa --quantize). Returns None if absent.
        """
        if not path or not os.path.exists(path):
            return None
        if self.logger:
            self.logger.info(f"Loading checkpoint (saved structure) from {path}")
        return self._ckpt.restore(path)
