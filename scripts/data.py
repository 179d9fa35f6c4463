"""Select train/validation/test read lists from an annotate support file.

Reference: scripts/data.py — reads with support 0 are positive (WGA chimera
artifacts), support >= 1 negative; sample to ``total_data`` with
``positive_data_ratio``; split by ratios; write ``name\\tTrue|False`` lists.
"""

from __future__ import annotations

import argparse
import math
import random
from pathlib import Path


def read_support_file(path: str) -> dict[str, int]:
    result = {}
    with open(path) as f:
        for line in f:
            content = line.strip().split()
            if content:
                result[content[0]] = int(content[1])
    return result


def is_positive(read_name: str, supportive_reads: dict[str, int]) -> bool:
    return supportive_reads.get(read_name) == 0


def select(
    supportive_file: str,
    output_dir: str,
    total_data: int,
    training_ratio: float = 0.7,
    validation_ratio: float = 0.2,
    test_ratio: float = 0.1,
    positive_data_ratio: float = 0.6,
    seed: int | None = None,
) -> None:
    if not math.isclose(training_ratio + validation_ratio + test_ratio, 1.0):
        raise ValueError("The sum of training, validation, and test ratios must be 1.0.")
    if seed is not None:
        random.seed(seed)

    supportive_reads = read_support_file(supportive_file)
    group_by_support: dict[int, list[str]] = {}
    for read_name, support in supportive_reads.items():
        group_by_support.setdefault(support, []).append(read_name)

    positive_data = group_by_support.get(0, [])
    negative_data = [r for s, reads in group_by_support.items() if s >= 1 for r in reads]
    random.shuffle(positive_data)
    random.shuffle(negative_data)

    num_positive = int(total_data * positive_data_ratio)
    num_negative = total_data - num_positive
    if len(positive_data) < num_positive:
        raise ValueError(f"Not enough positive data: have {len(positive_data)}, need {num_positive}")
    if len(negative_data) < num_negative:
        raise ValueError(f"Not enough negative data: have {len(negative_data)}, need {num_negative}")

    def three_way(samples: list[str], n: int):
        train_end = int(n * training_ratio)
        val_end = train_end + int(n * validation_ratio)
        return samples[:train_end], samples[train_end:val_end], samples[val_end:n]

    p_train, p_val, p_test = three_way(positive_data, num_positive)
    n_train, n_val, n_test = three_way(negative_data, num_negative)

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    for filename, data in (
        ("train.txt", p_train + n_train),
        ("validation.txt", p_val + n_val),
        ("test.txt", p_test + n_test),
    ):
        random.shuffle(data)
        with (out / filename).open("w") as f:
            for read_name in data:
                f.write(f"{read_name}\t{is_positive(read_name, supportive_reads)}\n")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("supportive_file")
    p.add_argument("output_dir")
    p.add_argument("total_data", type=int)
    p.add_argument("--training-ratio", type=float, default=0.7)
    p.add_argument("--validation-ratio", type=float, default=0.2)
    p.add_argument("--test-ratio", type=float, default=0.1)
    p.add_argument("--positive-data-ratio", type=float, default=0.6)
    p.add_argument("--seed", type=int, default=None)
    a = p.parse_args(argv)
    select(
        a.supportive_file, a.output_dir, a.total_data,
        a.training_ratio, a.validation_ratio, a.test_ratio, a.positive_data_ratio, a.seed,
    )


if __name__ == "__main__":
    main()
