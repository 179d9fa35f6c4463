"""Length bucketing: bounded XLA shape counts for variable-length reads.

The fast inference path and TPU training pad sequences to power-of-two
buckets so only ``len(buckets)`` shapes ever compile (the predict engine has
its own inline copy of the assignment logic; this module is the shared,
test-covered reference implementation used by datamodules).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

DEFAULT_BUCKETS = (512, 1024, 2048, 4096, 8192, 16384, 32768)


def bucket_for(length: int, buckets: tuple[int, ...] = DEFAULT_BUCKETS) -> int:
    """Smallest bucket >= length (largest bucket for oversized inputs)."""
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


def bucketize(
    items: Iterable, length_of, buckets: tuple[int, ...] = DEFAULT_BUCKETS, batch_size: int = 16
) -> Iterator[tuple[int, list]]:
    """Group a stream into (bucket, batch) pairs; partial batches flush at end."""
    pending: dict[int, list] = {b: [] for b in buckets}
    for item in items:
        b = bucket_for(length_of(item), buckets)
        pending[b].append(item)
        if len(pending[b]) == batch_size:
            yield b, pending[b]
            pending[b] = []
    for b, batch in pending.items():
        if batch:
            yield b, batch


def padding_waste(lengths: Iterable[int], buckets: tuple[int, ...] = DEFAULT_BUCKETS) -> float:
    """Fraction of padded tokens a bucket assignment would introduce."""
    total = padded = 0
    for n in lengths:
        b = bucket_for(n, buckets)
        total += b
        padded += b - min(n, b)
    return padded / total if total else 0.0
