"""Headline benchmark: BAM chimera-inference throughput per chip.

Prints ONE JSON line:
``{"metric": "bam_inference_reads_per_s", "value": N, "unit": "reads/s/chip",
   "vs_baseline": N / cpu_baseline}``

Workload: the reference test BAM (100 real ONT chimeric reads, 0.5k-137k
bases) cycled to ``--reads`` total, run through the production fast path
(length-bucketed batches, bf16 forward, masked pooling) on the default JAX
device.  The baseline divisor is the same engine on the CPU backend in f32
(the reference's deployment default is CPU batch-12 predict,
reference: chimeralm/__main__.py:253); measured once and cached in
``.bench_cpu_baseline.json``.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent
BAM = REPO / "tests/data/test_chimric_reads.bam"
CPU_CACHE = REPO / ".bench_cpu_baseline.json"


def build_engine(dtype: str, batch_size: int, tokens_per_batch=None, pipeline_depth=2, io_workers=2,
                 fft_method: str | None = None):
    import jax
    import jax.numpy as jnp

    from chimeralm_tpu.data.tokenizer import load_tokenizer_from_hyena_model
    from chimeralm_tpu.models.hyena import HyenaDnaClassifier, small_32k_config
    from chimeralm_tpu.runtime.predictor import PredictConfig, PredictEngine

    config = small_32k_config(
        dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
        fft_method=fft_method or os.environ.get("CHIMERALM_FFT_METHOD", "auto"),
    )
    model = HyenaDnaClassifier(config)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128), jnp.int32))["params"]
    tokenizer = load_tokenizer_from_hyena_model("hyenadna-small-32k-seqlen")
    cfg = PredictConfig(
        batch_size=batch_size, mode="fast", dtype=dtype,
        tokens_per_batch=tokens_per_batch, pipeline_depth=pipeline_depth,
        io_workers=io_workers,
    )
    return PredictEngine(model, params, tokenizer, cfg)


class NullWriter:
    def write_batch(self, *a, **k):
        pass


def warmup_reads_for_buckets(engine) -> list[dict]:
    """One full batch per bucket so the measured run never compiles."""
    out = []
    for bucket in engine.config.buckets:
        seq = "ACGT" * (max(bucket - 2, 4) // 4)
        rows = engine._rows_for_bucket(bucket)
        out.extend({"id": f"warm_{bucket}_{i}", "seq": seq} for i in range(rows))
    return out


def measure(engine, reads: list[dict], warmup: list[dict] | None = None) -> float:
    engine.predict(iter(warmup if warmup is not None else warmup_reads_for_buckets(engine)), writers=[NullWriter()])
    stats = engine.predict(iter(reads), writers=[NullWriter()])
    return stats.reads_per_s


def load_reads(n: int) -> list[dict]:
    from chimeralm_tpu.io.bam import iter_chimeric_reads

    base = list(iter_chimeric_reads(BAM))
    return list(itertools.islice(itertools.cycle(base), n))


def cpu_baseline(n_reads: int, refresh: bool = False) -> float:
    if CPU_CACHE.exists() and not refresh:
        try:
            return float(json.loads(CPU_CACHE.read_text())["reads_per_s"])
        except Exception:
            pass
    script = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.path.insert(0, %r);"
        "from bench import build_engine, load_reads, measure;"
        f"reads = load_reads({n_reads});"
        "eng = build_engine('float32', 12);"
        "rps = measure(eng, reads, reads);"
        "import json; print('CPU_RESULT ' + json.dumps({'reads_per_s': rps}))"
    ) % str(REPO)
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CPU_RESULT "):
            result = json.loads(line[len("CPU_RESULT "):])
            CPU_CACHE.write_text(json.dumps(result))
            return float(result["reads_per_s"])
    raise RuntimeError(f"cpu baseline failed: {out.stdout[-500:]} {out.stderr[-2000:]}")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--reads", type=int, default=600)
    parser.add_argument("--tokens-per-batch", type=int, default=262144)
    parser.add_argument("--pipeline-depth", type=int, default=8)
    parser.add_argument("--io-workers", type=int, default=4)
    parser.add_argument("--cpu-reads", type=int, default=25)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--fft-method", default=None,
                        help="auto|xla|matmul|pallas (default: CHIMERALM_FFT_METHOD or auto)")
    parser.add_argument("--refresh-cpu", action="store_true")
    args = parser.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    baseline = cpu_baseline(args.cpu_reads, refresh=args.refresh_cpu)

    engine = build_engine(args.dtype, args.batch_size, args.tokens_per_batch, args.pipeline_depth,
                          args.io_workers, fft_method=args.fft_method)
    reads = load_reads(args.reads)
    rps = measure(engine, reads)

    print(
        json.dumps(
            {
                "metric": "bam_inference_reads_per_s",
                "value": round(rps, 2),
                "unit": "reads/s/chip",
                "vs_baseline": round(rps / baseline, 2) if baseline else None,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
