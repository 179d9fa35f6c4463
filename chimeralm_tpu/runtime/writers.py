"""Prediction writers: per-batch label files and raw-logit dumps.

Reference: chimeralm/models/callbacks.py.

* ``PredictionWriter`` writes ``{output_dir}/{rank}_{batch_idx}.txt`` with one
  ``read_name\\tlabel`` line per read (reference: callbacks.py:134-142) —
  the exact on-disk format consumed by ``chimeralm filter``.
* ``CustomWriter`` dumps raw logits/labels/ids per batch as ``.npz``
  (reference stores torch ``.pt``; same keys: prediction, labels, id).
* ``resume_read_name`` unpacks the int8 ``[len, *ord]`` sidecar
  (reference: callbacks.py:38-63).

Writers are plain objects driven by the predict engine; per-host rank
stamping keeps the multi-host merge file-system based, exactly like the
reference's DDP behavior (each host writes its own shard files).
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)


def resume_read_name(bytes_data) -> str:
    """Convert the packed int8 ``[len, *ord(chars)]`` sidecar to a string."""
    if hasattr(bytes_data, "tolist"):
        bytes_data = bytes_data.tolist()
    if not bytes_data:
        return ""
    read_name_length = int(bytes_data[0])
    if read_name_length <= 0 or read_name_length >= len(bytes_data):
        raise ValueError("Invalid read name length")
    read_name_bytes = bytes_data[1 : 1 + read_name_length]
    return "".join(chr(b) for b in read_name_bytes if 32 <= b <= 126)


class PredictionWriter:
    """Writes per-batch ``{rank}_{batch_idx}.txt`` label files."""

    def __init__(self, output_dir: str | Path, write_interval: str = "batch", rank: int = 0) -> None:
        self.output_dir = Path(output_dir)
        self.write_interval = write_interval
        self.rank = rank

    def write_batch(self, logits: np.ndarray, ids: np.ndarray, batch_idx: int, valid: int | None = None) -> None:
        """Argmax over class axis and write one line per (valid) row.

        ``valid`` trims bucket-padding rows appended by the fast engine.
        """
        logits = np.asarray(logits)
        if logits.size == 0:
            logger.warning("Empty prediction tensor for batch %d", batch_idx)
            return
        preds = logits.argmax(axis=1)
        if valid is not None:
            preds = preds[:valid]
            ids = ids[:valid]
        if len(preds) != len(ids):
            logger.error("Size mismatch: predictions=%d ids=%d batch=%d", len(preds), len(ids), batch_idx)
            return

        lines = []
        for i, packed in enumerate(ids):
            try:
                name = resume_read_name(packed)
            except ValueError:
                logger.error("Error processing read name at index %d", i)
                name = f"error_read_{i}"
            if not name:
                name = f"unknown_read_{i}"
            lines.append(f"{name}\t{int(preds[i])}\n")

        self.output_dir.mkdir(parents=True, exist_ok=True)
        out = self.output_dir / f"{self.rank}_{batch_idx}.txt"
        try:
            with out.open("w") as f:
                f.writelines(lines)
        except OSError:
            logger.exception("Failed to write predictions to %s", out)


class CustomWriter:
    """Raw logit dumps, one ``.npz`` per batch (reference: callbacks.py:12-35)."""

    def __init__(self, output_dir: str | Path, write_interval: str = "batch", rank: int = 0) -> None:
        self.output_dir = Path(output_dir)
        self.write_interval = write_interval
        self.rank = rank

    def write_batch(self, logits, labels, ids, batch_idx: int, valid: int | None = None) -> None:
        self.output_dir.mkdir(parents=True, exist_ok=True)
        sl = slice(None) if valid is None else slice(0, valid)
        np.savez(
            self.output_dir / f"{self.rank}_{batch_idx}.npz",
            prediction=np.asarray(logits)[sl],
            labels=np.asarray(labels, dtype=np.int64)[sl],
            id=np.asarray(ids, dtype=np.int64)[sl],
        )


def load_predicts(path: str | Path) -> dict[str, int]:
    """Parse one ``name\\tlabel`` file (reference: __main__.py:26-61)."""
    predicts: dict[str, int] = {}
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"File not found: {path}")
    with path.open(encoding="utf-8") as f:
        for line_num, line in enumerate(f, 1):
            line = line.strip()
            if not line:
                continue
            parts = line.split("\t")
            if len(parts) != 2:
                raise ValueError(f"Invalid line format at line {line_num}: {line}")
            name, label_str = parts
            predicts[name] = int(label_str)
    return predicts


def load_predictions_from_folder(path: str | Path) -> dict[str, int]:
    """Merge every ``*.txt`` shard in a predictions folder (reference: __main__.py:64-69)."""
    predictions: dict[str, int] = {}
    for file in Path(path).glob("*.txt"):
        predictions.update(load_predicts(file))
    return predictions
