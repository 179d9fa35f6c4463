"""Precision audit: label agreement of the fast bf16 path vs the f32 reference path.

VERDICT r1 item 3: the bf16 + matmul/pallas-FFT production path must be
certified against the f32 XLA-FFT path **with a trained checkpoint**, not
random init (a production filter deletes reads from a BAM; label flips are
the metric that matters).

Runs the same reads through both configurations and reports:
* label agreement (target >= 99.9%)
* max |logit delta| and margin statistics (how close flips were)

Usage:
    python scripts/precision_audit.py --ckpt demo/flagship --reads 600
    python scripts/precision_audit.py --ckpt demo/flagship --fft-method pallas
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BAM = REPO / "tests/data/test_chimric_reads.bam"


def load_reads(n: int, synthetic_max_len: int | None = None, seed: int = 7) -> list[dict]:
    if synthetic_max_len:
        sys.path.insert(0, str(REPO / "scripts"))
        import make_synthetic_dataset as synth

        rng = np.random.default_rng(seed)
        return [
            {"id": f"synth_{i}", "seq": synth.make_read(rng, chimeric=bool(i % 2), min_len=300, max_len=synthetic_max_len)}
            for i in range(n)
        ]
    from chimeralm_tpu.io.bam import iter_chimeric_reads

    base = list(iter_chimeric_reads(BAM))
    return list(itertools.islice(itertools.cycle(base), n))


def run_path(loaded, reads, dtype: str, fft_method: str, max_length: int, batch_tokens: int):
    import dataclasses

    import jax.numpy as jnp

    from chimeralm_tpu.data.tokenizer import CharacterTokenizer
    from chimeralm_tpu.runtime.predictor import PredictConfig, PredictEngine

    cfg = dataclasses.replace(
        loaded.config,
        dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
        fft_method=fft_method,
    )
    model = type(loaded.model)(cfg)
    tok = CharacterTokenizer(model_max_length=max_length, padding_side="left")
    pcfg = PredictConfig(batch_size=8, mode="fast", dtype=dtype, tokens_per_batch=batch_tokens)
    engine = PredictEngine(model, loaded.params, tok, pcfg)

    logits_by_name: dict[str, np.ndarray] = {}

    class Collector:
        def write_batch(self, logits, ids, batch_idx, valid=None):
            from chimeralm_tpu.runtime.writers import resume_read_name

            logits = np.asarray(logits)
            if valid is not None:
                logits, ids = logits[:valid], ids[:valid]
            for packed, lg in zip(ids, logits):
                logits_by_name[resume_read_name(packed)] = lg

    engine.predict(iter(reads), writers=[Collector()])
    return logits_by_name


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", default=str(REPO / "demo" / "flagship"))
    p.add_argument("--reads", type=int, default=600)
    p.add_argument("--synthetic-max-len", type=int, default=None,
                   help="use synthetic WGA reads up to this length instead of the BAM")
    p.add_argument("--fft-method", default="matmul", choices=["matmul", "pallas", "xla"],
                   help="fast-path FFT method to audit (reference path is always f32+xla)")
    p.add_argument("--max-length", type=int, default=None)
    p.add_argument("--batch-tokens", type=int, default=262144)
    p.add_argument("--out", default=None, help="write the JSON report here")
    args = p.parse_args(argv)

    from chimeralm_tpu.models.lm import ChimeraLM

    loaded = ChimeraLM.from_pretrained(args.ckpt)
    max_length = args.max_length or loaded.config.max_seq_len
    reads = load_reads(args.reads, args.synthetic_max_len)

    fast = run_path(loaded, reads, "bfloat16", args.fft_method, max_length, args.batch_tokens)
    ref = run_path(loaded, reads, "float32", "xla", max_length, args.batch_tokens)

    names = sorted(set(fast) & set(ref))
    expected = set(r["id"].split("|")[0] for r in reads)
    missing = expected - set(names)
    assert not missing, (
        f"{len(missing)} reads dropped by one path (audit must cover every read): "
        f"{sorted(missing)[:5]}"
    )
    flips, deltas, margins = [], [], []
    for nm in names:
        lf, lr = fast[nm], ref[nm]
        deltas.append(float(np.abs(lf - lr).max()))
        margins.append(float(np.abs(lr[1] - lr[0])))
        if int(lf.argmax()) != int(lr.argmax()):
            flips.append({"name": nm, "fast": lf.tolist(), "ref": lr.tolist()})

    agreement = 1.0 - len(flips) / max(len(names), 1)
    report = {
        "metric": "bf16_label_agreement",
        "fft_method": args.fft_method,
        "n_reads": len(names),
        "agreement": round(agreement, 5),
        "n_flips": len(flips),
        "max_logit_delta": round(max(deltas), 5) if deltas else None,
        "median_ref_margin": round(float(np.median(margins)), 5) if margins else None,
        "flips": flips[:10],
    }
    print(json.dumps(report))
    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=2))
    return 0 if agreement >= 0.999 else 1


if __name__ == "__main__":
    sys.exit(main())
