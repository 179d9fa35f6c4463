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


def _noisy(rng, seq: str, sub_rate: float, indel_rate: float = 0.0) -> str:
    """ONT-style corruption: substitutions plus occasional 1-base indels."""
    out = []
    for c in seq:
        r = rng.random()
        if indel_rate and r < indel_rate / 2:
            continue  # deletion
        if indel_rate and r < indel_rate:
            out.append(str(BASES[rng.integers(0, 4)]))  # insertion
        if rng.random() < sub_rate:
            c = str(BASES[rng.integers(0, 4)])
        out.append(c)
    return "".join(out)


def make_read_hard(rng, chimeric: bool, min_len: int = 300, max_len: int = 2000,
                   sub_rate: float = 0.02, tail_lo: int = 20, tail_hi: int = 200) -> str:
    """De-saturated task variant (round-5: the easy task scored every
    backbone at F1 1.0 and ranked nothing).

    Positives are WGA fold-backs — prefix + junction adapter + noisy
    reverse-complement copy of the prefix tail (graded tail_lo-tail_hi bp)
    — with the adapter corrupted at a PER-READ rate drawn from
    {0, 5, 10, 15, 20, 30}% substitutions.  Detection difficulty therefore
    forms a continuum: clean adapters are trivial motif lookups, heavily
    corrupted ones require integrating distributed evidence or exploiting
    the fold-back structure itself, so held-out recall (and F1) scales
    with model capability instead of saturating at 1.0.  Negatives include
    hard structural decoys:

    * forward tandem repeat with a SCRAMBLED adapter (same base
      composition, order destroyed) — punishes composition-only shortcuts
      and non-revcomp duplication;
    * trans-junction with a scrambled adapter — a reverse-complement
      segment of an UNRELATED sequence (a biological inter-locus chimera,
      which the reference pipeline deliberately KEEPS, label 0).

    Everything is additionally corrupted at ``sub_rate`` substitutions +
    0.5% indels on the copies, mimicking ONT error.  Fully separating the
    classes requires order-sensitive motif detection at all corruption
    levels OR comparing the junction against the read's own upstream
    sequence — a skill gradient, not a lookup.
    """
    n = int(rng.integers(min_len, max_len))
    if chimeric:
        a_len = int(rng.integers(n // 3, 2 * n // 3))
        prefix = _random_seq(rng, a_len)
        # graded difficulty on BOTH axes: adapter corruption level (the
        # learnable continuum) and copy length (the matching signal)
        tail_len = int(rng.integers(tail_lo, tail_hi + 1))
        tail_len = min(tail_len, a_len)
        rate = float(rng.choice([0.0, 0.05, 0.10, 0.15, 0.20, 0.30]))
        adapter = _noisy(rng, ADAPTER, rate)
        copy = _noisy(rng, revcomp(prefix[-tail_len:]), sub_rate, 0.005)
        rest = _random_seq(rng, max(n - a_len - len(adapter) - len(copy), 10))
        seq = prefix + adapter + copy + rest
    else:
        kind = rng.random()
        if kind < 0.4:
            seq = _random_seq(rng, n)
        elif kind < 0.7:
            # forward tandem repeat: duplication WITHOUT reverse complement
            a_len = int(rng.integers(n // 3, 2 * n // 3))
            prefix = _random_seq(rng, a_len)
            tail_len = min(int(rng.integers(tail_lo, tail_hi + 1)), a_len)
            decoy = "".join(rng.permutation(list(ADAPTER)))
            copy = _noisy(rng, prefix[-tail_len:], sub_rate, 0.005)
            rest = _random_seq(rng, max(n - a_len - len(decoy) - len(copy), 10))
            seq = prefix + decoy + copy + rest
        else:
            # trans-junction: revcomp of an UNRELATED sequence spliced in
            a_len = int(rng.integers(n // 3, 2 * n // 3))
            prefix = _random_seq(rng, a_len)
            seg_len = int(rng.integers(tail_lo, tail_hi + 1))
            decoy = "".join(rng.permutation(list(ADAPTER)))
            copy = _noisy(rng, revcomp(_random_seq(rng, seg_len)), sub_rate, 0.005)
            rest = _random_seq(rng, max(n - a_len - len(decoy) - len(copy), 10))
            seq = prefix + decoy + copy + rest
    return _noisy(rng, seq, sub_rate / 2.5)


def generate(
    n_reads: int,
    out_path: str | Path,
    seed: int = 0,
    positive_ratio: float = 0.5,
    min_len: int = 300,
    max_len: int = 2000,
    mode: str = "easy",
):
    import pyarrow as pa
    import pyarrow.parquet as pq

    make = {"easy": make_read, "hard": make_read_hard}[mode]
    rng = np.random.default_rng(seed)
    ids, seqs, quals = [], [], []
    for i in range(n_reads):
        label = 1 if rng.random() < positive_ratio else 0
        seq = make(rng, chimeric=bool(label), min_len=min_len, max_len=max_len)
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
    p.add_argument("--mode", default="easy", choices=["easy", "hard"])
    a = p.parse_args(argv)
    print(generate(a.n_reads, a.out_path, a.seed, a.positive_ratio, a.min_len, a.max_len,
                   mode=a.mode))


if __name__ == "__main__":
    main()
