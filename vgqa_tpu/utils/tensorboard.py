"""TensorBoard scalar logging (parity with the SummaryWriter usage at
/root/reference/tools/train.py:132-134,233-238). Uses tf.summary when
TensorFlow is importable; silently no-ops otherwise (the reference likewise
swallows TB write failures)."""

from __future__ import annotations

from typing import Optional


class SummaryWriter:
    def __init__(self, log_dir: str):
        self._writer = None
        if not log_dir:
            return
        try:
            import tensorflow as tf  # noqa: WPS433

            self._writer = tf.summary.create_file_writer(log_dir)
        except Exception:
            self._writer = None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._writer is None:
            return
        try:
            import tensorflow as tf

            with self._writer.as_default():
                tf.summary.scalar(tag, float(value), step=int(step))
        except Exception:
            pass

    def flush(self) -> None:
        if self._writer is not None:
            try:
                self._writer.flush()
            except Exception:
                pass

    def close(self) -> None:
        self.flush()
