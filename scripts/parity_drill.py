"""One-command real-weights parity drill.

The day the production `yangliz5/chimeralm` weights become reachable
(reference: chimeralm/models/lm.py:17 — the HF hub checkpoint this
environment cannot download), this script proves parity in one run:

    python scripts/parity_drill.py --weights /path/to/chimeralm.safetensors \
        [--expected reference_labels.txt]

Stages (each reported in the JSON summary, nonzero exit on any failure):

1. **convert** — torch state dict (.safetensors/.pt/.bin/.ckpt) -> Flax
   pytree via ``chimeralm_tpu.models.convert`` (the converter whose key map
   is pinned against the torch mirror in tests/test_hyena_model.py).
2. **per-layer goldens** — the SAME weights loaded into the independent
   torch mirror of the HF remote-code graph (tests/torch_mirror.py);
   embeddings, every Hyena block, final norm, and logits compared
   activation-for-activation (localizes any divergence to one layer).
3. **CLI labels** — parity-mode engine (reference-exact batching: stream
   order, batch 12, left pad-to-longest, unmasked pooling,
   reference: chimeralm/__main__.py:267-317) over the test BAM; labels
   byte-diffed against ``--expected`` (a ``read_name\\tlabel`` file produced
   by the reference CLI) or, absent that, against the torch mirror pipeline
   run batch-for-batch on the same reads.
4. **precision audit** — fast-mode bf16 vs f32 labels on the same engine
   config: agreement fraction + max |logit delta| (the deployment dtype
   must not flip labels).

Tested end-to-end in CI with the torch mirror's random weights as a
stand-in (tests/test_scripts_and_extras.py), so the drill itself cannot
rot while waiting for egress.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


class CaptureWriter:
    """Collects per-read logits instead of writing txt files."""

    def __init__(self):
        self.logits: dict[str, np.ndarray] = {}

    def write_batch(self, logits, ids, batch_idx, valid=None):
        from chimeralm_tpu.runtime.writers import resume_read_name

        rows = logits.shape[0] if valid is None else valid
        for i in range(rows):
            self.logits[resume_read_name(ids[i])] = np.asarray(logits[i])


def _configs(scale: str):
    from chimeralm_tpu.models.hyena import small_32k_config, tiny_config
    from tests.torch_mirror import SMALL_32K_CFG, TINY_CFG

    if scale == "tiny":
        return tiny_config(), TINY_CFG, 512
    return small_32k_config(), SMALL_32K_CFG, 32768


def run_drill(weights: Path, bam: Path, scale: str = "small32k",
              expected: Path | None = None, skip_audit: bool = False,
              audit_reads: int | None = None) -> dict:
    import torch

    import jax.numpy as jnp
    from chimeralm_tpu.data.tokenizer import CharacterTokenizer
    from chimeralm_tpu.io.bam import iter_chimeric_reads
    from chimeralm_tpu.models.convert import convert_state_dict, load_torch_state_dict
    from chimeralm_tpu.models.hyena import HyenaDnaClassifier
    from chimeralm_tpu.runtime.predictor import PredictConfig, PredictEngine
    from chimeralm_tpu.runtime.writers import PredictionWriter
    from tests.torch_mirror import ChimeraLMTorch

    report: dict = {"weights": str(weights), "scale": scale, "stages": {}}
    ok = True

    fcfg, tcfg, max_len = _configs(scale)

    # -- stage 1: convert ---------------------------------------------------
    import jax

    sd = load_torch_state_dict(weights)
    params = convert_state_dict(sd)
    n_params = sum(int(np.prod(np.shape(v))) for v in jax.tree.leaves(params))
    report["stages"]["convert"] = {"ok": True, "n_params": n_params, "n_torch_keys": len(sd)}
    print(f"[drill] convert: {len(sd)} torch keys -> {n_params} Flax params", flush=True)

    # -- stage 2: per-layer goldens vs the torch mirror ----------------------
    tmodel = ChimeraLMTorch(tcfg).eval()
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, strict=False
    )
    golden = {"missing_keys": list(missing), "unexpected_keys": list(unexpected)}
    if missing:
        golden["ok"] = False
        ok = False
        print(f"[drill] FAIL goldens: mirror missing keys {missing[:5]}...", flush=True)
    else:
        fmodel = HyenaDnaClassifier(fcfg)
        L = min(256, max_len)
        ids_np = np.random.default_rng(5).integers(0, 12, size=(2, L)).astype(np.int32)

        t_acts: dict[str, np.ndarray] = {}

        def hook(name):
            def fn(mod, args, out):
                t_acts[name] = out.detach().numpy()
            return fn

        bb = tmodel.backbone.backbone
        bb.embeddings.register_forward_hook(hook("embed"))
        for i, layer in enumerate(bb.layers):
            layer.register_forward_hook(hook(f"block_{i}"))
        bb.ln_f.register_forward_hook(hook("ln_f"))
        with torch.no_grad():
            t_logits = tmodel(torch.from_numpy(ids_np).long()).numpy()

        f_logits, state = fmodel.apply(
            {"params": params}, jnp.asarray(ids_np),
            capture_intermediates=True, mutable=["intermediates"],
        )
        inter = state["intermediates"]["backbone"]
        f_acts = {
            "embed": np.asarray(inter["word_embeddings"]["__call__"][0]),
            "ln_f": np.asarray(inter["ln_f"]["__call__"][0]),
        }
        for i in range(fcfg.n_layer):
            f_acts[f"block_{i}"] = np.asarray(inter[f"layers_{i}"]["__call__"][0])

        layers = [("embed", 1e-6)] + [
            (f"block_{i}", 2e-4 * (i + 1)) for i in range(fcfg.n_layer)
        ] + [("ln_f", 1e-3)]
        golden["max_abs"] = {}
        golden["ok"] = True
        for name, atol in layers:
            delta = float(np.max(np.abs(f_acts[name] - t_acts[name])))
            golden["max_abs"][name] = delta
            scale_ref = max(1.0, float(np.max(np.abs(t_acts[name]))))
            if delta > atol + 1e-3 * scale_ref:
                golden["ok"] = False
                ok = False
                print(f"[drill] FAIL golden layer {name}: max|delta|={delta:.3e} > {atol:.0e}",
                      flush=True)
        golden["max_abs"]["logits"] = float(np.max(np.abs(np.asarray(f_logits) - t_logits)))
        if golden["max_abs"]["logits"] > 5e-4 + 1e-3 * float(np.max(np.abs(t_logits))):
            golden["ok"] = False
            ok = False
        print(f"[drill] goldens {'ok' if golden['ok'] else 'FAILED'}: "
              + ", ".join(f"{k}={v:.1e}" for k, v in golden["max_abs"].items()), flush=True)
    report["stages"]["goldens"] = golden

    # -- stage 3: parity-mode CLI labels -------------------------------------
    tok = CharacterTokenizer(model_max_length=max_len, padding_side="left")
    engine = PredictEngine(
        HyenaDnaClassifier(fcfg), params, tok,
        PredictConfig(batch_size=12, mode="parity", dtype="float32"),
    )
    with tempfile.TemporaryDirectory() as tmp:
        engine.predict_bam(bam, output_dir=tmp)
        lines = []
        for f in sorted(Path(tmp).glob("*.txt")):
            lines.extend(f.read_text().splitlines())
    got = dict(line.split("\t") for line in lines)

    if expected is not None:
        want = dict(line.split("\t") for line in Path(expected).read_text().splitlines())
        src = str(expected)
    else:
        # torch mirror pipeline, reference batching (stream order, batch 12,
        # left pad-to-longest) — the stand-in for the reference CLI's output
        reads = list(iter_chimeric_reads(bam))
        want = {}
        for i in range(0, len(reads), 12):
            chunk = reads[i : i + 12]
            enc = [tok.encode_np(r["seq"], truncation=True, max_length=tok.max_len_single_sentence)
                   for r in chunk]
            longest = max(len(e) for e in enc)
            ids = np.full((len(chunk), longest), 4, np.int64)
            for j, e in enumerate(enc):
                ids[j, longest - len(e):] = e
            with torch.no_grad():
                logits = tmodel(torch.from_numpy(ids)).numpy()
            for r, label in zip(chunk, logits.argmax(1)):
                want[r["id"]] = str(int(label))
        src = "torch mirror pipeline"
    mismatches = sorted(
        name for name in set(got) | set(want) if got.get(name) != want.get(name)
    )
    labels_ok = not mismatches
    ok = ok and labels_ok
    report["stages"]["cli_labels"] = {
        "ok": labels_ok, "n_reads": len(got), "expected_source": src,
        "n_mismatches": len(mismatches), "mismatches": mismatches[:20],
    }
    print(f"[drill] cli labels {'ok' if labels_ok else 'FAILED'}: "
          f"{len(got)} reads vs {src}, {len(mismatches)} mismatches", flush=True)

    # -- stage 4: bf16-vs-f32 precision audit ---------------------------------
    if not skip_audit:
        reads = list(iter_chimeric_reads(bam))
        if audit_reads:
            reads = reads[:audit_reads]
        caps = {}
        for dtype in ("float32", "bfloat16"):
            eng = PredictEngine(
                HyenaDnaClassifier(fcfg), params, tok,
                PredictConfig(batch_size=12, mode="fast", dtype=dtype,
                              buckets=tuple(b for b in (512, 1024, 2048, 4096, 8192,
                                                        16384, 32768) if b <= max_len)),
            )
            cap = CaptureWriter()
            eng.predict(iter(reads), writers=[cap])
            caps[dtype] = cap.logits
        names = sorted(caps["float32"])
        flips = [n for n in names
                 if caps["float32"][n].argmax() != caps["bfloat16"][n].argmax()]
        max_dlogit = max(
            float(np.max(np.abs(caps["float32"][n] - caps["bfloat16"][n]))) for n in names
        )
        margins = sorted(
            float(np.abs(caps["float32"][n][0] - caps["float32"][n][1])) for n in names
        )
        audit_ok = not flips
        ok = ok and audit_ok
        report["stages"]["precision_audit"] = {
            "ok": audit_ok, "n_reads": len(names), "n_flips": len(flips),
            "max_abs_dlogit": max_dlogit, "median_margin": margins[len(margins) // 2],
        }
        print(f"[drill] precision audit {'ok' if audit_ok else 'FAILED'}: "
              f"{len(flips)} flips, max|dlogit|={max_dlogit:.4f}", flush=True)

    report["ok"] = ok
    return report


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights", required=True,
                   help=".safetensors/.pt/.bin/.ckpt file or a directory containing one")
    p.add_argument("--bam", default=str(REPO / "tests/data/test_chimric_reads.bam"))
    p.add_argument("--scale", default="small32k", choices=["small32k", "tiny"],
                   help="tiny = CI stand-in scale (matches tests/torch_mirror.TINY_CFG)")
    p.add_argument("--expected", default=None,
                   help="read_name\\tlabel file from the reference CLI to byte-diff against")
    p.add_argument("--skip-audit", action="store_true")
    p.add_argument("--audit-reads", type=int, default=None)
    p.add_argument("--out", default=None, help="write the JSON report here")
    args = p.parse_args(argv)

    weights = Path(args.weights)
    if weights.is_dir():
        for pattern in ("*.safetensors", "*.ckpt", "*.pt", "*.bin"):
            hits = sorted(weights.glob(pattern))
            if hits:
                weights = hits[0]
                break
        else:
            print(f"[drill] no checkpoint file under {weights}", file=sys.stderr)
            return 2

    report = run_drill(
        weights, Path(args.bam), scale=args.scale,
        expected=Path(args.expected) if args.expected else None,
        skip_audit=args.skip_audit, audit_reads=args.audit_reads,
    )
    text = json.dumps(report, indent=2)
    if args.out:
        Path(args.out).write_text(text)
    print(text)
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
