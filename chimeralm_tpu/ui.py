"""Web UI for interactive chimera prediction (reference: chimeralm/ui.py).

Gradio Blocks app: paste a DNA sequence (ACGTN), get the chimera/biological
verdict with class confidences and a confidence bar chart, pick from example
sequences.  The app loads the model once at startup (reference: ui.py:22-34).

TPU-image realities: gradio/plotly aren't bundled here, so every UI-framework
dependency is gated — ``ChimeraLMPredictor``, ``format_result``, and
``confidence_figure`` (which falls back from plotly to matplotlib) are
UI-independent and fully tested; ``create_interface`` raises ImportError only
when gradio itself is missing.
"""

from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger(__name__)

MAX_LENGTH = 32768
VALID_CHARS = set("ACGTN")

#: colors of the reference's confidence chart (reference: ui.py:104-110)
COLOR_BIOLOGICAL = "#4CAF50"
COLOR_CHIMERIC = "#F44336"
COLOR_OTHER = "#E0E0E0"

#: example sequences offered in the UI (reference: ui.py:199-203)
EXAMPLES = [
    ["ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"],
    ["ATCGATCGATCGATCGATCGATCGATCGATCGATCGATCGATCGATCGATCGATCGATCGATCGATCGATCGATCGATCGATCGATCGATCGATCG"],
    ["GCTAGCTAGCTAGCTAGCTAGCTAGCTAGCTAGCTAGCTAGCTAGCTAGCTAGCTAGCTAGCTAGCTAGCTAGCTAGCTAGCTAGCTAGCTAGCT"],
]


class ChimeraLMPredictor:
    """Single-sequence predictor wrapping the flagship model.

    Reference: chimeralm/ui.py:13-79 (model+tokenizer load, ACGTN validation
    incl. lowercase, tokenize at max_length=32768, softmax confidence,
    per-class breakdown).
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
        # lowercase input is accepted and uppercased (reference: ui.py:43-48)
        seq = sequence.strip().upper().replace("\n", "").replace(" ", "")
        if not seq:
            return False, "Empty sequence"
        bad = set(seq) - VALID_CHARS
        if bad:
            return False, f"Invalid characters: {sorted(bad)}; only A, C, G, T, N are allowed"
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
            "verdict": "Chimeric Artifact" if label == 1 else "Biological",
            "confidence": float(probs[label]),
            "probabilities": {"Biological": float(probs[0]), "Chimeric Artifact": float(probs[1])},
            "length": len(seq),
            "truncated": len(seq) > MAX_LENGTH - 2,
        }


def format_result(result: dict) -> str:
    """Markdown result text (reference: ui.py:86-95)."""
    if "error" in result:
        return f"**Error:** {result['error']}"
    text = f"**Prediction:** {result['verdict']}\n**Confidence:** {result['confidence']:.3f}"
    text += f"\n**Length:** {result['length']:,} bases"
    if result.get("truncated"):
        text += f" (truncated to the model's {MAX_LENGTH:,}-token context)"
    text += "\n\n**Confidence Breakdown:**\n"
    for class_name, prob in result["probabilities"].items():
        text += f"- {class_name}: {prob:.3f}\n"
    return text


def confidence_figure(probabilities: dict | None, prediction: str | None = None):
    """Confidence bar chart; plotly if available, else matplotlib.

    Reference: ui.py:97-196 (plotly bar chart: predicted class green/red,
    other class gray, y range [0, 1.1], value labels on bars).  Returns None
    when neither plotting library is importable.
    """
    classes = list(probabilities or {})
    values = [float(v) for v in (probabilities or {}).values()]
    colors = [
        (COLOR_BIOLOGICAL if name == "Biological" else COLOR_CHIMERIC)
        if name == prediction
        else COLOR_OTHER
        for name in classes
    ]

    try:
        import plotly.graph_objects as go

        fig = go.Figure(
            data=[
                go.Bar(
                    x=classes,
                    y=values,
                    marker_color=colors,
                    text=[f"{v:.3f}" for v in values],
                    textposition="auto",
                )
            ]
        )
        fig.update_layout(
            title={"text": "Prediction Confidence", "x": 0.5, "xanchor": "center"},
            xaxis={"title": {"text": "Classification"}},
            yaxis={"title": {"text": "Probability"}, "range": [0, 1.1]},
            height=450,
            showlegend=False,
        )
        return fig
    except ImportError:
        pass

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 4.5))
        if classes:
            bars = ax.bar(classes, values, color=colors, width=0.6)
            ax.bar_label(bars, fmt="%.3f")
        ax.set_ylim(0, 1.1)
        ax.set_xlabel("Classification")
        ax.set_ylabel("Probability")
        ax.set_title("Prediction Confidence")
        fig.tight_layout()
        return fig
    except ImportError:
        return None


def create_interface(predictor: ChimeraLMPredictor | None = None):
    """Build the gradio Blocks app (raises ImportError without gradio).

    Reference: ui.py:82-395 — header, input column with examples, results
    column with markdown + confidence plot, about/footer.
    """
    import gradio as gr

    predictor = predictor or ChimeraLMPredictor()

    def run(sequence):
        result = predictor.predict(sequence)
        text = format_result(result)
        fig = confidence_figure(result.get("probabilities"), result.get("verdict"))
        return text, fig

    with gr.Blocks(title="ChimeraLM - Chimeric Read Detector") as demo:
        gr.Markdown(
            "# 🧬 ChimeraLM\n"
            "**Chimeric read detection for whole-genome-amplified long reads (TPU-native)**"
        )
        with gr.Row():
            with gr.Column(scale=1):
                gr.Markdown(
                    "## Sequence Input\n"
                    "1. Enter your DNA sequence (any length)\n"
                    "2. Use standard nucleotides: **A**, **C**, **G**, **T**, **N**\n"
                    f"3. Sequences longer than {MAX_LENGTH:,} bases are truncated\n"
                    "4. Click **Analyze Sequence**"
                )
                seq_in = gr.Textbox(
                    label="DNA Sequence",
                    placeholder="Enter your DNA sequence here...\nExample: ACGTACGTACGTACGT...",
                    lines=8,
                )
                btn = gr.Button("Analyze Sequence", variant="primary")
                gr.Examples(examples=EXAMPLES, inputs=[seq_in], label="Example Sequences")
            with gr.Column(scale=1):
                gr.Markdown("## Analysis Results")
                verdict = gr.Markdown(
                    value="Enter a sequence and click 'Analyze Sequence' to see results."
                )
                plot = gr.Plot(label="Probability Distribution", value=None)
        gr.Markdown(
            "## About ChimeraLM\n"
            "- Binary classification: biological vs chimeric sequences\n"
            f"- Handles up to {MAX_LENGTH:,} nucleotides (HyenaDNA-small-32k backbone)\n"
            "- Trained for whole-genome-amplification artifact detection\n\n"
            "[GitHub](https://github.com/ylab-hi/ChimeraLM)"
        )
        btn.click(run, inputs=seq_in, outputs=[verdict, plot])
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
