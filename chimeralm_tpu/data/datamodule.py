"""Datamodule base: tokenized in-memory datasets -> collated numpy batches.

Replaces the Lightning datamodules + HF datasets + torch DataLoader stack
(reference: chimeralm/data/{bam,fq,only_fq}.py) with a numpy pipeline:

* examples are tokenized once into feature dicts (vectorized LUT tokenizer,
  optional thread pool);
* train batches shuffle per-epoch with a seeded RNG (reference train loaders
  shuffle, fq.py:280) and pad to longest-in-batch (reference collator), or
  to power-of-two buckets for the TPU-friendly path;
* ``global batch`` semantics: callers shard the leading dim over the dp mesh
  axis (the reference divides batch_size by world size, bam.py:142-146 —
  same math, expressed as sharding).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

from chimeralm_tpu.data.collator import DataCollator
from chimeralm_tpu.data.tokenizer import (
    tokenize_and_align_labels_and_quals,
    tokenize_and_align_labels_and_quals_ids,
)


class DataModule:
    """Shared train/val/test/predict plumbing over ``{"id","seq"[,"qual"]}`` reads."""

    def __init__(
        self,
        tokenizer,
        batch_size: int,
        num_workers: int = 0,
        include_qual: bool = False,
        pad_to_multiple_of: int | None = None,
        max_train_samples: int | None = None,
        max_val_samples: int | None = None,
        max_test_samples: int | None = None,
        max_predict_samples: int | None = None,
    ):
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.include_qual = include_qual
        self.collator = DataCollator(tokenizer, pad_to_multiple_of=pad_to_multiple_of)
        self.max_samples = {
            "train": max_train_samples,
            "val": max_val_samples,
            "test": max_test_samples,
            "predict": max_predict_samples,
        }
        self.data: dict[str, list[dict]] = {}

    # -- subclass hooks ----------------------------------------------------
    def read_split(self, split: str):
        """Yield raw ``{"id", "seq"[, "qual"]}`` dicts for a split."""
        raise NotImplementedError

    # -- setup -------------------------------------------------------------
    def _tokenize_split(self, split: str) -> list[dict]:
        max_length = self.tokenizer.max_len_single_sentence
        predict = split == "predict"

        def encode(read):
            if predict:
                return tokenize_and_align_labels_and_quals_ids(
                    read, self.tokenizer, max_length, include_qual=self.include_qual
                )
            return tokenize_and_align_labels_and_quals(
                read, self.tokenizer, max_length, include_qual=self.include_qual
            )

        reads = self.read_split(split)
        limit = self.max_samples[split]
        if limit is not None:
            reads = (r for i, r in enumerate(reads) if i < limit)
        if self.num_workers > 1:
            with ThreadPoolExecutor(self.num_workers) as pool:
                return list(pool.map(encode, reads))
        return [encode(r) for r in reads]

    def setup(self, stage: str | None = None) -> None:
        splits = {
            "fit": ("train", "val"),
            "validate": ("val",),
            "test": ("test",),
            "predict": ("predict",),
            None: ("train", "val", "test"),
        }[stage]
        for split in splits:
            if split not in self.data:
                self.data[split] = self._tokenize_split(split)

    def __len__(self):
        return sum(len(v) for v in self.data.values())

    # -- batch iterators ---------------------------------------------------
    def _iter_batches(self, split: str, shuffle: bool, seed: int | None = None, drop_last: bool = False):
        examples = self.data[split]
        order = np.arange(len(examples))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        B = self.batch_size
        for i in range(0, len(order), B):
            idx = order[i : i + B]
            if drop_last and len(idx) < B:
                return
            yield self.collator([examples[j] for j in idx])

    def train_batches(self, epoch: int = 0, seed: int = 42, drop_last: bool = False):
        return self._iter_batches("train", shuffle=True, seed=seed + epoch, drop_last=drop_last)

    def val_batches(self):
        return self._iter_batches("val", shuffle=False)

    def test_batches(self):
        return self._iter_batches("test", shuffle=False)

    def predict_reads(self):
        """Raw reads for the PredictEngine (which tokenizes itself)."""
        return self.read_split("predict")

    @property
    def num_classes(self) -> int:
        return 2


class BamDataModule(DataModule):
    """Streams chimeric (SA-tagged primary) reads from BAM files.

    Reference: chimeralm/data/bam.py:41-322.  Labels come from ``name|label``
    read names (``parse_target``); predict keeps packed read-id sidecars.
    """

    def __init__(
        self,
        tokenizer,
        train_data_path: str | Path | None = None,
        val_data_path: str | Path | None = None,
        test_data_path: str | Path | None = None,
        predict_data_path: str | Path | None = None,
        batch_size: int = 12,
        **kw,
    ):
        super().__init__(tokenizer, batch_size, **kw)
        self.paths = {
            "train": train_data_path,
            "val": val_data_path,
            "test": test_data_path,
            "predict": predict_data_path,
        }

    def read_split(self, split: str):
        from chimeralm_tpu.io.bam import iter_chimeric_reads

        path = self.paths[split]
        if path is None:
            raise ValueError(f"{split} data path is required")
        return iter_chimeric_reads(path)


class ParquetDataModule(DataModule):
    """Parquet ``{id, seq, qual}`` datamodule with %-based splits.

    Reference: chimeralm/data/fq.py:25-346 (train[:p0%], [p0:p0+p1], rest).
    """

    def __init__(
        self,
        tokenizer,
        train_data_path: str | Path,
        val_data_path: str | Path | None = None,
        test_data_path: str | Path | None = None,
        predict_data_path: str | Path | None = None,
        train_val_test_split: tuple[float, float, float] = (0.8, 0.1, 0.1),
        batch_size: int = 12,
        **kw,
    ):
        super().__init__(tokenizer, batch_size, **kw)
        self.paths = {
            "train": train_data_path,
            "val": val_data_path,
            "test": test_data_path,
            "predict": predict_data_path,
        }
        self.split_fracs = train_val_test_split
        self._table_cache: dict[str, list[dict]] = {}

    def _load_parquet(self, path) -> list[dict]:
        key = str(path)
        if key not in self._table_cache:
            import pyarrow.parquet as pq

            table = pq.read_table(path)
            cols = {name: table[name].to_pylist() for name in table.column_names}
            n = table.num_rows
            has_qual = "qual" in cols
            self._table_cache[key] = [
                {
                    "id": cols["id"][i],
                    "seq": cols["seq"][i],
                    **({"qual": cols["qual"][i]} if has_qual else {}),
                }
                for i in range(n)
            ]
        return self._table_cache[key]

    def read_split(self, split: str):
        if split == "predict":
            if self.paths["predict"] is None:
                raise ValueError("predict data path is required")
            return iter(self._load_parquet(self.paths["predict"]))
        # explicit per-split files when all three are given; otherwise %-split
        # the train file (reference: fq.py:195-228)
        if self.paths["val"] is not None and self.paths["test"] is not None:
            return iter(self._load_parquet(self.paths[split]))
        # %-slice the train file (HF datasets percent semantics: floor(n*pct/100))
        rows = self._load_parquet(self.paths["train"])
        n = len(rows)
        p0 = int(self.split_fracs[0] * 100)
        p1 = int(self.split_fracs[1] * 100)
        lo = {"train": 0, "val": n * p0 // 100, "test": n * (p0 + p1) // 100}[split]
        hi = {"train": n * p0 // 100, "val": n * (p0 + p1) // 100, "test": n}[split]
        return iter(rows[lo:hi])


class FastqDataModule(DataModule):
    """FASTQ datamodule (reference: chimeralm/data/only_fq.py:44-329)."""

    def __init__(
        self,
        tokenizer,
        train_data_path: str | Path | None = None,
        val_data_path: str | Path | None = None,
        test_data_path: str | Path | None = None,
        predict_data_path: str | Path | None = None,
        batch_size: int = 12,
        **kw,
    ):
        super().__init__(tokenizer, batch_size, **kw)
        self.paths = {
            "train": train_data_path,
            "val": val_data_path,
            "test": test_data_path,
            "predict": predict_data_path,
        }

    def read_split(self, split: str):
        from chimeralm_tpu.io.fastq import parse_fastq_file_with_qual

        path = self.paths[split]
        if path is None:
            raise ValueError(f"{split} data path is required")
        return parse_fastq_file_with_qual(path)
