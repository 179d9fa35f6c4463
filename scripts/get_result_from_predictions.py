"""Consolidate prediction outputs into a single ``name\\tlabel`` file.

Reference: scripts/get_result_from_predictions.py — two subcommands:
``from-dumps`` reads the raw-logit dumps written by CustomWriter (.npz here,
.pt in the reference) and argmaxes; ``collect`` concatenates the per-batch
``*.txt`` label files of PredictionWriter.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

from chimeralm_tpu.runtime.writers import resume_read_name

logging.basicConfig(level=logging.INFO, format="%(message)s")
logger = logging.getLogger("get_result")


def collect_predict_from_folder(folder: Path):
    for file in sorted(Path(folder).glob("*.npz")):
        data = np.load(file)
        if "id" not in data or "prediction" not in data:
            logger.error("Invalid prediction file format: %s", file)
            continue
        labels = data["prediction"].argmax(axis=1)
        for packed, label in zip(data["id"], labels):
            yield resume_read_name(packed.astype(np.int8)), int(label)


def from_dumps(input_path: Path, output_path: Path) -> tuple[int, int]:
    total = label_1 = 0
    with output_path.open("w") as f:
        for name, label in collect_predict_from_folder(input_path):
            f.write(f"{name}\t{label}\n")
            total += 1
            label_1 += label == 1
    logger.info("wrote %d predictions (%d chimeric) -> %s", total, label_1, output_path)
    return total, label_1


def collect(input_path: Path, output_path: Path | None) -> Path:
    output_path = output_path or input_path.parent.parent / "predictions.txt"
    logger.info("Writing predictions to %s", output_path)
    with Path(output_path).open("w") as out:
        for txt in sorted(Path(input_path).glob("*.txt")):
            out.write(txt.read_text())
    return output_path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("from-dumps")
    s.add_argument("input_path", type=Path)
    s.add_argument("output_path", type=Path)
    s = sub.add_parser("collect")
    s.add_argument("input_path", type=Path)
    s.add_argument("--output-path", type=Path, default=None)
    a = p.parse_args(argv)
    if a.cmd == "from-dumps":
        from_dumps(a.input_path, a.output_path)
    else:
        collect(a.input_path, a.output_path)


if __name__ == "__main__":
    main()
