"""Metrics logging: JSONL always; TensorBoard scalars when TF is present
(SURVEY.md §5 metrics row)."""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricLogger:
    def __init__(self, workdir: str, use_tensorboard: bool = True):
        os.makedirs(workdir, exist_ok=True)
        self._jsonl = open(os.path.join(workdir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(
                    os.path.join(workdir, "tb")
                )
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict, stage: Optional[int] = None) -> None:
        record = {
            "step": int(step),
            "time": time.time(),
            **({"stage": int(stage)} if stage is not None else {}),
            **{k: float(np.asarray(v)) for k, v in metrics.items()},
        }
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default(step=int(step)):
                for k, v in record.items():
                    if k not in ("step", "time") and isinstance(v, float):
                        tf.summary.scalar(k, v)

    def log_artifacts(self, step: int, waves, images, sample_rate: int) -> None:
        """Audio + spectrogram-image summaries for TensorBoard (SURVEY.md
        §5 metrics row). No-op without a TB writer."""
        if self._tb is None:
            return
        import tensorflow as tf

        waves = np.asarray(waves, np.float32)
        images = np.asarray(images, np.float32)
        with self._tb.as_default(step=int(step)):
            tf.summary.audio(
                "ema_samples",
                np.clip(waves, -1, 1)[..., None],
                sample_rate,
                max_outputs=waves.shape[0],
            )
            # channel 0 (scaled log-mel magnitude), mapped [-1,1] -> [0,1],
            # time on x: transpose to [mel, time] per image
            mag = np.clip((images[..., 0] + 1.0) / 2.0, 0.0, 1.0)
            # [B, time, mel] -> [B, mel, time, 1] with low mel at the bottom
            mag = np.ascontiguousarray(
                np.transpose(mag, (0, 2, 1))[:, ::-1, :, None]
            )
            tf.summary.image(
                "ema_logmelmag", mag, max_outputs=images.shape[0]
            )

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
