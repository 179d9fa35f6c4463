"""Batch inference engine: BAM/FASTQ/parquet reads -> per-read labels.

Replaces the reference's Lightning ``trainer.predict`` inner loop
(reference: chimeralm/__main__.py:248-319 -> basic_module.py:177-187 ->
callbacks.py:79-150) with a jit-compiled JAX driver.

Two modes:

* ``parity``  — reproduce the reference CLI exactly: stream order, fixed
  batch size (default 12), pad-to-longest-in-batch with the tokenizer's
  padding side, ``attention_mask=None``.  Logits match the torch pipeline
  batch-for-batch (given converted weights); one XLA compile per distinct
  batch shape.
* ``fast``    — TPU production path: length-bucketed batches (powers of two),
  right padding + attention mask.  Masked pooling makes logits invariant to
  the bucket length, so results are deterministic regardless of batching,
  and only ``len(buckets)`` shapes are ever compiled.  Device dispatch is
  async; host tokenization of batch N+1 overlaps device compute of batch N.

Multi-host / multi-chip: reads are striped across hosts (``shard_index`` /
``num_shards``); within a host, batches shard across the ``dp`` mesh axis.
Output files are rank-stamped ``{rank}_{batch}.txt`` exactly like DDP ranks
in the reference (callbacks.py:134), so the downstream ``filter`` merge is
unchanged.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from collections.abc import Iterable, Iterator
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from chimeralm_tpu.data.tokenizer import (
    PAD_ID,
    CharacterTokenizer,
    encode_read_id,
)
from chimeralm_tpu.parallel.mesh import pad_batch_to_multiple, shard_batch
from chimeralm_tpu.runtime.writers import PredictionWriter

logger = logging.getLogger(__name__)

DEFAULT_BUCKETS = (512, 1024, 2048, 4096, 8192, 16384, 32768)

#: finer length grid (~1.3x steps): cuts pow2 bucketing's padded-token
#: overhead from ~22% to ~9% on the reference read-length mix.  Every added
#: bucket still rides a fused pallas kernel on TPU: 3072/6144 hit the
#: direct kernels at the next power-of-two fft (n >= 2L), 12288/24576 the
#: m-block kernel.  Costs 5 extra compiles (one per bucket).
FINE_BUCKETS = (512, 1024, 1536, 2048, 3072, 4096, 6144, 8192, 12288, 16384, 24576, 32768)


@dataclasses.dataclass
class PredictConfig:
    batch_size: int = 12
    mode: str = "fast"  # "fast" | "parity"
    # fine grid is the production default: 205.9 vs 187.0 reads/s measured
    # on the bench mix (masked pooling makes labels bucket-invariant)
    buckets: tuple[int, ...] = FINE_BUCKETS
    dtype: str = "float32"  # "float32" | "bfloat16"
    max_length: int | None = None  # defaults to tokenizer.max_len_single_sentence
    pad_batch: bool = True  # pad final partial batches to full size (fast mode)
    # fast mode: per-bucket batch rows = tokens_per_batch // bucket (keeps
    # device work per dispatch roughly constant and amortizes dispatch
    # latency on short reads); None = fixed batch_size for every bucket
    tokens_per_batch: int | None = None
    max_rows: int = 1024
    # batches in flight before a grouped D2H fetch.  (A threaded D2H drain
    # was tried and REMOVED: concurrent fetches through the axon relay fail
    # with FAILED_PRECONDITION and regress throughput — docs/roadmap.md.)
    pipeline_depth: int = 2
    # precompute the Hyena implicit filter once per length bucket and pass
    # it into the jitted forward (params are frozen at inference, so the
    # filter MLP output is a constant per bucket) — fast mode only
    cache_filters: bool = True


@dataclasses.dataclass
class PredictStats:
    n_reads: int = 0
    n_batches: int = 0
    n_tokens: int = 0
    n_padded_tokens: int = 0
    wall_s: float = 0.0
    # per-bucket token histograms (bucket length -> tokens): lets the bench
    # price FLOPs at each batch's actual length instead of a flat L=32768
    bucket_tokens: dict = dataclasses.field(default_factory=dict)
    bucket_valid_tokens: dict = dataclasses.field(default_factory=dict)

    @property
    def reads_per_s(self) -> float:
        return self.n_reads / self.wall_s if self.wall_s else 0.0

    @property
    def tokens_per_s(self) -> float:
        return self.n_tokens / self.wall_s if self.wall_s else 0.0


class PredictEngine:
    """jit-per-bucket inference driver over a (possibly 1-chip) mesh."""

    def __init__(
        self,
        model,
        params,
        tokenizer: CharacterTokenizer | None = None,
        config: PredictConfig | None = None,
        mesh=None,
        rank: int = 0,
    ):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer or CharacterTokenizer(model_max_length=32768, padding_side="left")
        self.config = config or PredictConfig()
        self.mesh = mesh
        self.rank = rank
        self._n_dp = 1 if mesh is None else int(np.prod(mesh.devices.shape))

        # honor config.dtype for models that carry a compute-dtype config
        # (the flagship HyenaDnaClassifier); other zoo models compute in f32
        model_cfg = getattr(self.model, "config", None)
        if (
            self.config.dtype == "bfloat16"
            and model_cfg is not None
            and getattr(model_cfg, "dtype", None) not in (None, jnp.bfloat16)
        ):
            import dataclasses as _dc

            self.model = self.model.clone(config=_dc.replace(model_cfg, dtype=jnp.bfloat16))

        # all compiled forwards emit logits padded to one fixed row count, so
        # grouped result fetches concatenate identical shapes (single compile)
        if self.config.mode == "fast" and self.config.tokens_per_batch is not None:
            self._fixed_rows = max(self._rows_for_bucket(b) for b in self.config.buckets)
        else:
            self._fixed_rows = self.config.batch_size

        # single-chip path: pin params on device once so every dispatch does
        # not re-transfer ~28 MB of weights through the (slow) relay link
        if self.mesh is None and not all(
            isinstance(leaf, jax.Array) for leaf in jax.tree.leaves(self.params)
        ):
            self.params = jax.device_put(self.params)

        # per-bucket implicit-filter cache: the filter is a pure function of
        # (params, L), so at inference it is evaluated once per bucket and
        # handed to the forward as data instead of recomputed every batch
        self._use_filter_cache = (
            self.config.cache_filters
            and self.config.mode == "fast"
            and hasattr(self.model, "filters")
        )
        self._filter_cache: dict[int, tuple] = {}

        def pad_rows(logits):
            rows = logits.shape[0]
            if rows >= self._fixed_rows:
                return logits
            return jnp.pad(logits, ((0, self._fixed_rows - rows), (0, 0)))

        use_cache = self._use_filter_cache

        def forward(params, input_ids, attention_mask, filter_cache):
            variables = {"params": params}
            kw = {"filter_cache": filter_cache} if use_cache else {}
            out = self.model.apply(
                variables, input_ids, attention_mask=attention_mask, deterministic=True, **kw
            ).astype(jnp.float32)
            return pad_rows(out)

        def forward_nomask(params, input_ids):
            variables = {"params": params}
            out = self.model.apply(variables, input_ids, deterministic=True).astype(jnp.float32)
            return pad_rows(out)

        self._forward = jax.jit(forward)
        self._forward_nomask = jax.jit(forward_nomask)
        if self._use_filter_cache:
            self._filter_fn = jax.jit(
                lambda params, L: self.model.apply({"params": params}, L, method="filters"),
                static_argnums=1,
            )

    def _bucket_filter_cache(self, L: int):
        """Evaluate (once) and return the per-layer filter cache for bucket L."""
        if not self._use_filter_cache:
            return None
        cache = self._filter_cache.get(L)
        if cache is None:
            cache = tuple(
                self._augment_with_block_spectra(k_layer, L)
                for k_layer in self._filter_fn(self.params, L)
            )
            self._filter_cache[L] = cache
        return cache

    def _augment_with_block_spectra(self, k_time, L: int):
        """Attach per-order filter spectra for the fused mixer kernels.

        The spectra are a pure function of (filter, bucket) — computing them
        here (once per bucket) removes the filter DFTs from every batch
        forward.  Small/mid buckets get direct spectra (batch-pair fused
        mixer), long buckets get m-block spectra; ``k_time`` is returned
        unchanged on backends/shapes neither kernel covers.
        """
        cfg = getattr(self.model, "config", None)
        if cfg is None or jax.default_backend() != "tpu":
            return k_time
        if getattr(cfg, "fft_method", None) not in ("auto", "pallas"):
            return k_time
        from chimeralm_tpu.ops.pallas_dft import (
            _MIN_BLOCK_L,
            block_spectra_for_length,
            direct_filter_spectra,
            mixer_fused_direct_available,
        )

        order, D = cfg.hyena_order, cfg.d_model
        k = k_time.reshape(L, order - 1, D).transpose(1, 2, 0)  # (order-1, D, L)
        if L < _MIN_BLOCK_L and mixer_fused_direct_available(D, L, self._rows_for_bucket(L)):
            n = 1
            while n < 2 * L:
                n <<= 1
            specs = tuple(direct_filter_spectra(k[o], n) for o in range(order - 1))
            return (k_time, specs)
        specs = tuple(block_spectra_for_length(k[o], L) for o in range(order - 1))
        if any(s is None for s in specs):
            return k_time
        return (k_time, specs)

    # -- tokenization ------------------------------------------------------
    def _max_length(self) -> int:
        if self.config.max_length is not None:
            return self.config.max_length
        return self.tokenizer.max_len_single_sentence

    def _encode(self, read: dict) -> tuple[np.ndarray, np.ndarray]:
        ids = self.tokenizer.encode_np(read["seq"], truncation=True, max_length=self._max_length())
        sidecar = np.asarray(encode_read_id(read["id"]), dtype=np.int64).astype(np.int8)
        return ids, sidecar

    # -- batch assembly ----------------------------------------------------
    def _iter_parity_batches(self, pairs: Iterable[tuple]) -> Iterator[dict]:
        batch: list[tuple[np.ndarray, np.ndarray]] = []
        for pair in pairs:
            batch.append(pair)
            if len(batch) == self.config.batch_size:
                yield self._pack_parity(batch)
                batch = []
        if batch:
            yield self._pack_parity(batch)

    def _pack_parity(self, batch) -> dict:
        longest = max(len(ids) for ids, _ in batch)
        side = self.tokenizer.padding_side
        input_ids = np.full((len(batch), longest), PAD_ID, np.int32)
        sidecars = np.empty((len(batch), 256), np.int8)
        for i, (ids, sc) in enumerate(batch):
            if side == "right":
                input_ids[i, : len(ids)] = ids
            else:
                input_ids[i, longest - len(ids) :] = ids
            sidecars[i] = sc
        return {"input_ids": input_ids, "id": sidecars, "valid": len(batch), "mask": None}

    def _bucket_for(self, n: int) -> int:
        for b in self.config.buckets:
            if n <= b:
                return b
        return self.config.buckets[-1]

    def _rows_for_bucket(self, bucket: int) -> int:
        cfg = self.config
        if cfg.tokens_per_batch is None:
            return cfg.batch_size
        rows = max(1, cfg.tokens_per_batch // bucket)
        rows = min(rows, cfg.max_rows)
        if rows > 1 and rows % 2:
            rows -= 1  # even rows keep the batch-pair DFT kernel eligible
        rows += pad_batch_to_multiple(rows, self._n_dp)
        return rows

    def _iter_fast_batches(self, pairs: Iterable[tuple]) -> Iterator[dict]:
        pending: dict[int, list] = {b: [] for b in self.config.buckets}
        for ids, sc in pairs:
            bucket = self._bucket_for(len(ids))
            pending[bucket].append((ids, sc))
            if len(pending[bucket]) == self._rows_for_bucket(bucket):
                yield self._pack_fast(pending[bucket], bucket)
                pending[bucket] = []
        for bucket, batch in pending.items():
            if batch:
                yield self._pack_fast(batch, bucket)

    def _pack_fast(self, batch, bucket: int) -> dict:
        valid = len(batch)
        rows = valid
        if self.config.pad_batch:
            rows = self._rows_for_bucket(bucket)
        rows += pad_batch_to_multiple(rows, self._n_dp)
        input_ids = np.full((rows, bucket), PAD_ID, np.int32)
        mask = np.zeros((rows, bucket), np.int32)
        sidecars = np.zeros((rows, 256), np.int8)
        for i, (ids, sc) in enumerate(batch):
            input_ids[i, : len(ids)] = ids  # fast mode is always right-padded
            mask[i, : len(ids)] = 1
            sidecars[i] = sc
        return {"input_ids": input_ids, "id": sidecars, "valid": valid, "mask": mask}

    # -- driver ------------------------------------------------------------
    def predict(
        self,
        reads: Iterable[dict],
        writers: list | None = None,
        output_dir: str | Path | None = None,
        shard_index: int = 0,
        num_shards: int = 1,
    ) -> PredictStats:
        """Run inference over ``{"id", "seq"}`` dicts; returns throughput stats."""
        return self.predict_encoded(
            (self._encode(r) for r in reads),
            writers=writers,
            output_dir=output_dir,
            shard_index=shard_index,
            num_shards=num_shards,
        )

    def predict_encoded(
        self,
        pairs: Iterable[tuple],
        writers: list | None = None,
        output_dir: str | Path | None = None,
        shard_index: int = 0,
        num_shards: int = 1,
    ) -> PredictStats:
        """Run inference over pre-tokenized (ids, sidecar) pairs."""
        if writers is None:
            if output_dir is None:
                raise ValueError("need writers or output_dir")
            writers = [PredictionWriter(output_dir, rank=self.rank)]

        if num_shards > 1:
            pairs = (r for i, r in enumerate(pairs) if i % num_shards == shard_index)

        batches = (
            self._iter_parity_batches(pairs)
            if self.config.mode == "parity"
            else self._iter_fast_batches(pairs)
        )

        stats = PredictStats()
        start = time.perf_counter()

        # Each host<->device fetch pays a full roundtrip (the dominant cost
        # behind a relayed TPU).  Dispatch stays fully async; results are
        # fetched in *groups*: logits of `pipeline_depth` batches are
        # concatenated on-device and pulled with a single transfer, then
        # split host-side for the writers.
        inflight: list[tuple] = []  # (logits_dev, batch, batch_idx)

        def flush():
            if not inflight:
                return
            if len(inflight) == 1:
                merged = np.asarray(inflight[0][0])
            else:
                merged = np.asarray(jnp.concatenate([l for l, _b, _i in inflight], axis=0))
            off = 0
            for logits_dev, batch, idx in inflight:
                rows = logits_dev.shape[0]
                logits = merged[off : off + rows]
                off += rows
                for w in writers:
                    w.write_batch(logits, batch["id"], idx, valid=batch["valid"])
            inflight.clear()

        depth = max(1, self.config.pipeline_depth)
        for batch_idx, batch in enumerate(batches):
            device_in = {"input_ids": batch["input_ids"]}
            if batch["mask"] is not None:
                device_in["attention_mask"] = batch["mask"]
            device_in = shard_batch(device_in, self.mesh)
            if batch["mask"] is not None:
                fc = self._bucket_filter_cache(batch["input_ids"].shape[1])
                logits = self._forward(
                    self.params, device_in["input_ids"], device_in["attention_mask"], fc
                )
            else:
                logits = self._forward_nomask(self.params, device_in["input_ids"])
            inflight.append((logits, batch, batch_idx))
            if len(inflight) >= depth:
                flush()

            stats.n_reads += batch["valid"]
            stats.n_batches += 1
            stats.n_tokens += int(batch["input_ids"].shape[0] * batch["input_ids"].shape[1])
            # parity mode has no mask; PAD-id count gives the same quantity
            valid_tokens = int(
                batch["mask"].sum()
                if batch["mask"] is not None
                else (batch["input_ids"] != PAD_ID).sum()
            )
            stats.n_padded_tokens += int(
                batch["input_ids"].shape[0] * batch["input_ids"].shape[1] - valid_tokens
            )
            L = int(batch["input_ids"].shape[1])
            stats.bucket_tokens[L] = stats.bucket_tokens.get(L, 0) + int(
                batch["input_ids"].shape[0] * L
            )
            stats.bucket_valid_tokens[L] = stats.bucket_valid_tokens.get(L, 0) + valid_tokens
        flush()
        stats.wall_s = time.perf_counter() - start
        logger.info(
            "predict: %d reads in %d batches, %.2f reads/s",
            stats.n_reads,
            stats.n_batches,
            stats.reads_per_s,
        )
        return stats

    def predict_bam(
        self,
        bam_path: str | Path,
        output_dir: str | Path,
        use_native: bool | None = None,
        threads: int = 4,
        **kw,
    ) -> PredictStats:
        """BAM inference; prefers the C++ streaming tokenizer when built."""
        from chimeralm_tpu.io import native

        if use_native is None:
            use_native = native.available()
        if use_native:
            tok = native.NativeBamTokenizer(bam_path, max_len=self._max_length(), threads=max(1, threads))
            with tok:
                return self.predict_encoded(iter(tok), output_dir=output_dir, **kw)
        from chimeralm_tpu.io.bam import iter_chimeric_reads

        return self.predict(iter_chimeric_reads(bam_path), output_dir=output_dir, **kw)

    def predict_fastq(self, fq_path: str | Path, output_dir: str | Path, **kw) -> PredictStats:
        from chimeralm_tpu.io.fastq import parse_fastq_file

        return self.predict(parse_fastq_file(fq_path), output_dir=output_dir, **kw)

    def predict_parquet(self, path: str | Path, output_dir: str | Path, **kw) -> PredictStats:
        import pyarrow.parquet as pq

        table = pq.read_table(path, columns=["id", "seq"])
        reads = ({"id": i, "seq": s} for i, s in zip(table["id"].to_pylist(), table["seq"].to_pylist()))
        return self.predict(reads, output_dir=output_dir, **kw)
