"""Split a FASTQ into train/validation/test FASTQs with ``@name|label`` headers.

Reference: scripts/extract.py:52-137 — read assignment lists are
``name\\tTrue|False`` files from scripts/data.py; matching reads are written
to the split's FASTQ with the 0/1 label appended to the name.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

from chimeralm_tpu.io.fastq import read_fastq

logging.basicConfig(level=logging.INFO, format="%(message)s")
logger = logging.getLogger("extract")


def load_read_assignments(path: str) -> dict[str, bool]:
    out = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split("\t")
            if len(parts) == 2:
                out[parts[0]] = parts[1] == "True"
    return out


def extract(fq_file: str, train_file: str, validation_file: str, test_file: str, output_dir: str = "."):
    for fp in (fq_file, train_file, validation_file, test_file):
        if not Path(fp).exists():
            raise FileNotFoundError(fp)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)

    assignments = {
        "train": load_read_assignments(train_file),
        "validation": load_read_assignments(validation_file),
        "test": load_read_assignments(test_file),
    }
    outputs = {
        "train": (out / f"{Path(train_file).stem}.fastq").open("w"),
        "validation": (out / f"{Path(validation_file).stem}.fastq").open("w"),
        "test": (out / f"{Path(test_file).stem}.fastq").open("w"),
    }
    stats = {k: 0 for k in ("train", "validation", "test", "unassigned", "total_processed")}
    try:
        for rec in read_fastq(fq_file):
            stats["total_processed"] += 1
            for split, names in assignments.items():
                if rec.name in names:
                    label = 1 if names[rec.name] else 0
                    outputs[split].write(f"@{rec.name}|{label}\n{rec.seq}\n+\n{rec.qual}\n")
                    stats[split] += 1
                    break
            else:
                stats["unassigned"] += 1
    finally:
        for f in outputs.values():
            f.close()
    logger.info("extraction stats: %s", stats)
    return stats


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("fq_file")
    p.add_argument("train_file")
    p.add_argument("validation_file")
    p.add_argument("test_file")
    p.add_argument("--output-dir", default=".")
    a = p.parse_args(argv)
    extract(a.fq_file, a.train_file, a.validation_file, a.test_file, a.output_dir)


if __name__ == "__main__":
    main()
