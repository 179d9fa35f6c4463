"""Read-length statistics for FASTQ/BAM inputs (reference: scripts/read_len.py).

Subcommands: ``fq`` (length histogram of a FASTQ, optionally restricted to a
chimeric-read name list), ``bam`` (chimeric-read lengths above a MAPQ floor).
Writes a histogram PNG next to the input when matplotlib is available.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def _report(lengths: list[int], out_png: Path | None):
    arr = np.asarray(lengths)
    if arr.size == 0:
        print("no reads")
        return
    print(
        f"n={arr.size} min={arr.min()} max={arr.max()} mean={arr.mean():.1f} "
        f"median={np.median(arr):.0f} p95={np.percentile(arr, 95):.0f}"
    )
    if out_png is not None:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plt.figure(figsize=(8, 4))
            plt.hist(arr, bins=100)
            plt.xlabel("read length")
            plt.ylabel("count")
            plt.tight_layout()
            plt.savefig(out_png)
            print(f"histogram -> {out_png}")
        except ImportError:
            pass


def cmd_fq(file: Path, chimeric_read_file: Path | None):
    from chimeralm_tpu.io.fastq import read_fastq

    keep = None
    if chimeric_read_file is not None:
        keep = {line.strip() for line in chimeric_read_file.read_text().splitlines() if line.strip()}
    lengths = [len(r.seq) for r in read_fastq(file) if keep is None or r.name in keep]
    _report(lengths, file.with_suffix(".read_len.png"))


def cmd_bam(file: Path, min_mapq: int):
    from chimeralm_tpu.io.bam import BamReader, is_chimeric

    lengths = []
    with BamReader(file) as reader:
        for rec in reader:
            if is_chimeric(rec) and rec.mapq >= min_mapq:
                lengths.append(rec.l_seq)
    _report(lengths, file.with_suffix(".read_len.png"))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("fq")
    s.add_argument("file", type=Path)
    s.add_argument("--chimeric-read-file", type=Path, default=None)
    s = sub.add_parser("bam")
    s.add_argument("file", type=Path)
    s.add_argument("--min-mapq", type=int, default=10)
    a = p.parse_args(argv)
    if a.cmd == "fq":
        cmd_fq(a.file, a.chimeric_read_file)
    else:
        cmd_bam(a.file, a.min_mapq)


if __name__ == "__main__":
    main()
