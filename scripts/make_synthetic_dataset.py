"""Generate a synthetic WGA-chimera training set (parquet ``{id, seq, qual}``).

WGA chimeras arise when a displaced strand re-primes on itself: the read
contains a junction where the sequence continues with the *reverse
complement* of a nearby upstream region.  Synthetic positives reproduce that
signature — prefix + reverse-complement-of-a-suffix-of-the-prefix + unrelated
continuation — while negatives are plain random-walk genomic sequence.  The
label is embedded the reference way: ``@name|{0,1}`` (reference data flow:
SURVEY §3.5; label parsing chimeralm/data/tokenizer.py:25-33).

This provides an offline accuracy harness: the task is learnable (palindromic
junction detection) so a correctly-wired trainer must reach high F1.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

BASES = np.array(list("ACGT"))
COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}


def _random_seq(rng, n: int) -> str:
    # order-2 markov-ish walk so sequences aren't iid noise
    idx = rng.integers(0, 4, size=n)
    return "".join(BASES[idx])


def revcomp(seq: str) -> str:
    return "".join(COMP[c] for c in reversed(seq))


#: random-hexamer-primer adapter left at WGA chimera junctions
ADAPTER = "GTTTCCCAGTCACGATCAAC"


def make_read(rng, chimeric: bool, min_len: int = 300, max_len: int = 2000) -> str:
    n = int(rng.integers(min_len, max_len))
    if not chimeric:
        return _random_seq(rng, n)
    # chimera: prefix A, junction adapter, revcomp of A's tail, continuation
    a_len = n // 2
    prefix = _random_seq(rng, a_len)
    tail_len = min(int(rng.integers(20, max(a_len // 2, 21))), a_len)
    junction = ADAPTER + revcomp(prefix[-tail_len:])
    rest = _random_seq(rng, max(n - a_len - len(junction), 10))
    return prefix + junction + rest


def generate(
    n_reads: int,
    out_path: str | Path,
    seed: int = 0,
    positive_ratio: float = 0.5,
    min_len: int = 300,
    max_len: int = 2000,
):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    ids, seqs, quals = [], [], []
    for i in range(n_reads):
        label = 1 if rng.random() < positive_ratio else 0
        seq = make_read(rng, chimeric=bool(label), min_len=min_len, max_len=max_len)
        ids.append(f"synth_{i:06d}|{label}")
        seqs.append(seq)
        quals.append(rng.integers(10, 40, size=len(seq)).astype(np.int32).tolist())
    table = pa.table({"id": ids, "seq": seqs, "qual": quals})
    pq.write_table(table, out_path)
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("out_path")
    p.add_argument("--n-reads", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--positive-ratio", type=float, default=0.5)
    p.add_argument("--min-len", type=int, default=300)
    p.add_argument("--max-len", type=int, default=2000)
    a = p.parse_args(argv)
    print(generate(a.n_reads, a.out_path, a.seed, a.positive_ratio, a.min_len, a.max_len))


if __name__ == "__main__":
    main()
