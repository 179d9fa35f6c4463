"""``chimeralm`` CLI: predict / filter / web / tools.

Replaces the reference Typer app (reference: chimeralm/__main__.py) with an
argparse CLI exposing the same commands, flags, defaults, and on-disk
formats; TPU-specific knobs (mode, dtype, buckets, mesh) are additive.

Commands
--------
* ``predict <data.bam>``   chimeric-read classification -> ``*.predictions/``
* ``filter  <bam> <pred>`` drop predicted-1 reads, sort + index
* ``web``                  gradio UI (if gradio is installed)
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from collections import Counter
from pathlib import Path

from chimeralm_tpu.version import __version__

log = logging.getLogger("chimeralm")

BANNER = r"""
    ━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━

       ╔══╗  ╦ ╦ ╦  ╔╦╗  ╔═╗  ╦═╗  ╔═╗   ╦   ╔╦╗
       ║     ╠═╣ ║  ║║║  ║╣   ╠╦╝  ╠═╣   ║   ║║║
       ╚══╝  ╩ ╩ ╩  ╩ ╩  ╚═╝  ╩╚═  ╩ ╩   ╩═╝ ╩ ╩

    ━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━
        ◆ Genomic Language Model — TPU native
        ◆ WGA Chimera Detection
    ━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━━
"""


def set_logging_level(level: int = logging.INFO) -> None:
    logging.basicConfig(level=level, format="%(message)s")


def filter_bam_by_prediction(
    bam_path: Path,
    prediction_path: Path,
    index: bool = True,
    output_prediction: bool = False,
    threads: int = 4,
) -> None:
    """Filter a BAM by a predictions folder (reference: __main__.py:99-153).

    Output chain: ``x.bam -> x.filtered.bam -> x.filtered.sorted.bam + .bai``.
    """
    from chimeralm_tpu.io.bam import bam_index, bam_sort, filter_bam
    from chimeralm_tpu.runtime.writers import load_predictions_from_folder

    predictions = load_predictions_from_folder(prediction_path)
    if not predictions:
        log.warning("No predictions found")
        return

    if output_prediction:
        consolidated = Path(prediction_path) / "predictions.txt"
        log.info("Writing all predictions to %s", consolidated)
        with consolidated.open("w") as f:
            for name, label in predictions.items():
                f.write(f"{name}\t{label}\n")

    log.info("Loaded %d predictions from %s", len(predictions), prediction_path)
    counter = Counter(predictions.values())
    n = len(predictions)
    log.info(
        "Biological: %d (%.1f%%), Chimera artifact: %d (%.1f%%)",
        counter.get(0, 0),
        counter.get(0, 0) / n * 100,
        counter.get(1, 0),
        counter.get(1, 0) / n * 100,
    )

    output_path = bam_path.with_suffix(".filtered.bam")
    try:
        from chimeralm_tpu.io import native

        if native.available():
            drop = [n for n, label in predictions.items() if label == 1]
            native.filter_bam_native(bam_path, output_path, drop, threads=threads)
        else:
            filter_bam(bam_path, predictions, output_path, threads=threads)
    except Exception:
        if output_path.exists():
            output_path.unlink()
        raise

    if index:
        log.info("Sorting %s", output_path)
        sorted_output_path = output_path.with_suffix(".sorted.bam")
        bam_sort(output_path, sorted_output_path, threads=threads)
        log.info("Indexing %s", sorted_output_path)
        bam_index(sorted_output_path)


def cmd_predict(args: argparse.Namespace) -> int:
    set_logging_level(logging.DEBUG if args.verbose else logging.INFO)

    import os

    import jax

    platform = args.platform or os.environ.get("CHIMERALM_PLATFORM")
    if platform:
        # must be a config update, not an env var: the site hook pins the
        # relay platform after env resolution
        jax.config.update("jax_platforms", platform)

    from chimeralm_tpu.data.tokenizer import load_tokenizer_from_hyena_model
    from chimeralm_tpu.models.lm import ChimeraLM
    from chimeralm_tpu.parallel.mesh import make_mesh
    from chimeralm_tpu.runtime.predictor import PredictConfig, PredictEngine

    # multi-process runtime (reference DDP semantics: configs/trainer/ddp.yaml;
    # local 2-proc sim: configs/trainer/ddp_sim.yaml) — each process predicts a
    # striped shard of the reads and writes rank-stamped files
    proc_index, proc_count = 0, 1
    if args.coordinator or args.num_processes is not None or args.process_id is not None:
        import os as _os

        if not (args.coordinator or _os.environ.get("CHIMERALM_COORDINATOR")):
            log.error("--num-processes requires --coordinator (host:port)")
            return 2
        if args.num_processes is not None and args.process_id is None:
            log.error("--num-processes requires --process-id (this process's rank 0..N-1)")
            return 2
        if args.process_id is not None and args.num_processes is None:
            log.error("--process-id requires --num-processes")
            return 2
        from chimeralm_tpu.parallel.dist import initialize

        proc_index, proc_count = initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        log.info("distributed runtime: process %d/%d", proc_index, proc_count)

    data_path = Path(args.data_path)
    output_path = Path(args.output) if args.output else data_path.with_suffix(".predictions")
    output_path.mkdir(parents=True, exist_ok=True)

    tokenizer = load_tokenizer_from_hyena_model("hyenadna-small-32k-seqlen")
    if args.ckpt is not None:
        log.info("Loading model from %s", args.ckpt)
        loaded = ChimeraLM.from_pretrained(args.ckpt)
    else:
        log.info("Loading model from local checkpoint mirror (%s)", ChimeraLM.DEFAULT_NAME)
        try:
            loaded = ChimeraLM.from_pretrained()
        except FileNotFoundError:
            log.warning(
                "No pretrained checkpoint found (set CHIMERALM_CHECKPOINT_DIR or pass "
                "--ckpt); falling back to a random-initialized model — predictions "
                "are NOT meaningful, this mode only exercises the pipeline."
            )
            loaded = ChimeraLM.new(seed=42)

    # a smaller-context checkpoint (e.g. a distilled/tiny model) caps the
    # tokenizer: padding past the model's positional grid is invalid
    model_ctx = getattr(loaded.config, "max_seq_len", None)
    if model_ctx and tokenizer.model_max_length and tokenizer.model_max_length > model_ctx:
        tokenizer.model_max_length = model_ctx
        log.info("capping tokenizer context to the model's max_seq_len=%d", model_ctx)

    n_devices = len(jax.devices())
    use = min(args.devices, n_devices) if args.devices > 0 else 1
    mesh = make_mesh(use) if use > 1 else None
    log.info("Devices: %d available, using %d (%s)", n_devices, use, jax.devices()[0].platform)

    config = PredictConfig(
        batch_size=args.batch_size,
        mode=args.mode,
        dtype=args.dtype,
        tokens_per_batch=args.tokens_per_batch,
        pipeline_depth=args.pipeline_depth,
    )
    engine = PredictEngine(
        loaded.model, loaded.params, tokenizer, config, mesh=mesh, rank=proc_index
    )
    shard_kw = {"shard_index": proc_index, "num_shards": proc_count}

    suffix = data_path.suffix.lower()
    t0 = time.perf_counter()
    if suffix == ".bam":
        stats = engine.predict_bam(
            data_path, output_path, threads=max(1, args.workers or 4), **shard_kw
        )
    elif suffix in (".fq", ".fastq", ".gz"):
        stats = engine.predict_fastq(data_path, output_path, **shard_kw)
    elif suffix == ".parquet":
        stats = engine.predict_parquet(data_path, output_path, **shard_kw)
    else:
        log.error("Unsupported input type: %s", data_path)
        return 1
    wall = time.perf_counter() - t0
    log.info(
        "Predicted %d reads in %.2fs (%.1f reads/s) -> %s",
        stats.n_reads,
        wall,
        stats.n_reads / max(wall, 1e-9),
        output_path,
    )
    log.info("Filtering %s by predictions from %s", data_path, output_path)
    return 0


def cmd_filter(args: argparse.Namespace) -> int:
    set_logging_level(logging.DEBUG if args.verbose else logging.INFO)
    log.info("Filtering %s by predictions from %s", args.bam_path, args.predictions_path)
    filter_bam_by_prediction(
        Path(args.bam_path),
        Path(args.predictions_path),
        index=True,
        output_prediction=args.output_prediction,
    )
    return 0


def cmd_web(args: argparse.Namespace) -> int:  # noqa: ARG001
    from chimeralm_tpu import ui

    return ui.main()


def cmd_tools(args: argparse.Namespace) -> int:
    """Pass through to the C++ multi-call binary (builds it if needed)."""
    import subprocess

    tools_bin = Path(__file__).resolve().parents[1] / "tools" / "build" / "chimera-tools"
    if not tools_bin.exists():
        from chimeralm_tpu.io import native

        if not native.build():
            log.error("native tools are not built and the toolchain is unavailable")
            return 1
    argv = args.tool_args
    if argv and argv[0] == "--":
        argv = argv[1:]
    if not argv:
        log.error("usage: chimeralm tools <extractsa|annotate|annotatesv|getsvfromvcf|addtarget|summary|compare|query> ...")
        return 2
    return subprocess.call([str(tools_bin), *argv])


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="chimeralm",
        description=(
            "ChimeraLM: a genomic language model to identify chimera artifacts "
            "introduced by whole genome amplification (WGA)."
        ),
    )
    parser.add_argument("-V", "--version", action="version", version=f"chimeralm {__version__}")
    sub = parser.add_subparsers(dest="command")

    p = sub.add_parser("predict", help="Predict the given dataset using ChimeraLM.")
    p.add_argument("data_path", help="Path to the dataset (.bam/.fq/.fastq/.parquet)")
    p.add_argument("-g", "--gpus", "--devices", dest="devices", type=int, default=0,
                   help="Number of accelerator devices to use (0 = single default device)")
    p.add_argument("-o", "--output", default=None, help="Output path for predictions")
    p.add_argument("-b", "--batch-size", type=int, default=12, help="Batch size")
    p.add_argument("-w", "--workers", type=int, default=0, help="Number of IO workers")
    p.add_argument("-c", "--ckpt", default=None, help="Path to the checkpoint file")
    p.add_argument("-r", "--random", action="store_true", help="Make the prediction not deterministic")
    p.add_argument("-v", "--verbose", action="store_true", help="Enable verbose output")
    p.add_argument("--mode", choices=("fast", "parity"), default="parity",
                   help="parity: reference-exact batching; fast: bucketed+masked TPU path")
    p.add_argument("--dtype", choices=("float32", "bfloat16"), default="float32")
    p.add_argument("--tokens-per-batch", type=int, default=None,
                   help="fast mode: per-bucket batch rows = budget // bucket")
    p.add_argument("--pipeline-depth", type=int, default=2,
                   help="batches in flight before result fetch")
    p.add_argument("--platform", default=None,
                   help="force the jax platform (tpu/cpu); also CHIMERALM_PLATFORM")
    p.add_argument("--coordinator", default=None,
                   help="multi-process coordinator address (host:port); enables jax.distributed")
    p.add_argument("--num-processes", type=int, default=None,
                   help="total number of processes in the distributed run")
    p.add_argument("--process-id", type=int, default=None,
                   help="this process's index in the distributed run")
    p.set_defaults(func=cmd_predict)

    p = sub.add_parser("filter", help="Filter the BAM file by predictions.")
    p.add_argument("bam_path", help="Path to the BAM file")
    p.add_argument("predictions_path", help="Path to the predictions folder")
    p.add_argument("-p", "--output-prediction", action="store_true",
                   help="write summary of the predictions")
    p.add_argument("-v", "--verbose", action="store_true")
    p.set_defaults(func=cmd_filter)

    p = sub.add_parser("web", help="Launch the web interface.")
    p.set_defaults(func=cmd_web)

    p = sub.add_parser(
        "tools",
        help="Run a native dataset-curation tool (extractsa/annotate/...).",
        add_help=False,
    )
    p.add_argument("tool_args", nargs=argparse.REMAINDER)
    p.set_defaults(func=cmd_tools)

    return parser


def main(argv: list[str] | None = None) -> int:
    print(BANNER)
    parser = build_parser()
    args = parser.parse_args(argv)
    if not getattr(args, "func", None):
        parser.print_help()
        return 0
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
