"""FASTQ sampling/splitting utilities (reference: scripts/split.py).

Subcommands: split (sample N lines of a list), extract (subset FASTQ by
name list), add-target (append |label to all reads), make-train
(ratio-split a FASTQ into train/val/test).
"""

from __future__ import annotations

import argparse
import random
from pathlib import Path

from chimeralm_tpu.io.fastq import read_fastq


def cmd_split(input_file: Path, select_num: int):
    lines = input_file.read_text().splitlines(keepends=True)
    random.shuffle(lines)
    out = input_file.parent / f"{input_file.stem}_select_{select_num}.txt"
    out.write_text("".join(lines[:select_num]))
    print(out)


def cmd_extract(input_fq: Path, select_file: Path):
    select_reads = {line.strip() for line in select_file.read_text().splitlines() if line.strip()}
    out = input_fq.parent / f"{input_fq.stem}_select_{len(select_reads)}.fastq"
    with out.open("w") as f:
        for rec in read_fastq(input_fq):
            if rec.name in select_reads:
                f.write(f"@{rec.name}\n{rec.seq}\n+\n{rec.qual}\n")
    print(out)


def cmd_add_target(input_fq: Path, target: int):
    out = input_fq.parent / f"{input_fq.stem}_target_{target}.fastq"
    with out.open("w") as f:
        for rec in read_fastq(input_fq):
            f.write(f"@{rec.name}|{target}\n{rec.seq}\n+\n{rec.qual}\n")
    print(out)


def cmd_make_train(input_fq: Path, train_ratio: float, val_ratio: float, test_ratio: float):
    reads = list(read_fastq(input_fq))
    random.shuffle(reads)
    n = len(reads)
    train_num = int(n * train_ratio)
    val_num = int(n * val_ratio)
    outs = {
        "train": input_fq.parent / f"{input_fq.stem}_train.fastq",
        "val": input_fq.parent / f"{input_fq.stem}_val.fastq",
        "test": input_fq.parent / f"{input_fq.stem}_test.fastq",
    }
    with outs["train"].open("w") as f1, outs["val"].open("w") as f2, outs["test"].open("w") as f3:
        for i, rec in enumerate(reads):
            f = f1 if i < train_num else f2 if i < train_num + val_num else f3
            f.write(f"@{rec.name}\n{rec.seq}\n+\n{rec.qual}\n")
    print(*outs.values())


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("split")
    s.add_argument("input_file", type=Path)
    s.add_argument("select_num", type=int)
    s = sub.add_parser("extract")
    s.add_argument("input_fq", type=Path)
    s.add_argument("select_file", type=Path)
    s = sub.add_parser("add-target")
    s.add_argument("input_fq", type=Path)
    s.add_argument("--target", type=int, default=0)
    s = sub.add_parser("make-train")
    s.add_argument("input_fq", type=Path)
    s.add_argument("--train-ratio", type=float, default=0.7)
    s.add_argument("--val-ratio", type=float, default=0.2)
    s.add_argument("--test-ratio", type=float, default=0.1)
    a = p.parse_args(argv)
    if a.cmd == "split":
        cmd_split(a.input_file, a.select_num)
    elif a.cmd == "extract":
        cmd_extract(a.input_fq, a.select_file)
    elif a.cmd == "add-target":
        cmd_add_target(a.input_fq, a.target)
    else:
        cmd_make_train(a.input_fq, a.train_ratio, a.val_ratio, a.test_ratio)


if __name__ == "__main__":
    main()
