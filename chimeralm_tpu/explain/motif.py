"""Interpretability: perturbation importance + activation capture.

Reference: chimeralm/explain/motif.py (``Mamba2Analyzer``) — forward hooks
capture per-layer activations; position importance is measured by N-masking
windows and observing the change in the predicted class probability;
important windows are mined and visualized as a heatmap.

Flax re-design: activation capture uses ``capture_intermediates`` (no hooks
needed); the perturbation sweep is *batched* — every masked variant is one
row of a single (W, L) batch, so the whole importance profile costs one jit
call instead of W sequential forwards.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from chimeralm_tpu.data.tokenizer import CharacterTokenizer

N_TOKEN_ID = 11


@dataclasses.dataclass
class ImportanceResult:
    positions: np.ndarray  # window start positions
    importance: np.ndarray  # |delta prob| per window
    base_prob: float
    predicted_class: int


class ModelAnalyzer:
    """Model-agnostic analyzer for any classifier in the zoo."""

    def __init__(self, model, params, tokenizer: CharacterTokenizer | None = None, max_batch: int = 64):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer or CharacterTokenizer(model_max_length=32768)
        self.max_batch = max_batch
        self._forward = jax.jit(
            lambda p, ids: jax.nn.softmax(
                self.model.apply({"params": p}, ids, deterministic=True), axis=-1
            )
        )

    def _encode(self, sequence: str) -> np.ndarray:
        return self.tokenizer.encode_np(sequence, truncation=True)

    def predict_proba(self, sequence: str) -> np.ndarray:
        ids = self._encode(sequence)[None]
        return np.asarray(self._forward(self.params, jnp.asarray(ids)))[0]

    def capture_activations(self, sequence: str, filter_fn=None) -> dict:
        """Per-module intermediate outputs (hook-equivalent)."""
        ids = jnp.asarray(self._encode(sequence)[None])
        _, state = self.model.apply(
            {"params": self.params},
            ids,
            deterministic=True,
            capture_intermediates=filter_fn or (lambda mdl, _method: True),
            mutable=["intermediates"],
        )
        return jax.tree.map(np.asarray, state["intermediates"])

    def position_importance(self, sequence: str, window_size: int = 10, stride: int | None = None) -> ImportanceResult:
        """N-mask each window; importance = |p(class) - p_base(class)|.

        Reference method: motif.py:64-82 (sequential loop); here all masked
        variants run as batched rows.
        """
        stride = stride or window_size
        ids = self._encode(sequence)
        L = len(ids)
        base = np.asarray(self._forward(self.params, jnp.asarray(ids[None])))[0]
        cls = int(base.argmax())

        starts = np.arange(1, L - 1, stride)  # skip CLS/SEP positions
        importance = np.zeros(len(starts), np.float32)
        for lo in range(0, len(starts), self.max_batch):
            chunk = starts[lo : lo + self.max_batch]
            batch = np.tile(ids, (len(chunk), 1))
            for i, s in enumerate(chunk):
                batch[i, s : min(s + window_size, L - 1)] = N_TOKEN_ID
            probs = np.asarray(self._forward(self.params, jnp.asarray(batch)))
            importance[lo : lo + len(chunk)] = np.abs(probs[:, cls] - base[cls])
        return ImportanceResult(starts, importance, float(base[cls]), cls)

    def find_important_windows(self, sequence: str, window_size: int = 10, top_k: int = 5) -> list[dict]:
        """Mine the top-k most influential windows with their subsequences."""
        res = self.position_importance(sequence, window_size)
        order = np.argsort(res.importance)[::-1][:top_k]
        out = []
        for idx in order:
            start = int(res.positions[idx])
            out.append(
                {
                    "start": start - 1,  # sequence coordinates (CLS removed)
                    "end": start - 1 + window_size,
                    "importance": float(res.importance[idx]),
                    "subsequence": sequence[start - 1 : start - 1 + window_size],
                }
            )
        return out

    def plot_importance(self, sequence: str, window_size: int = 10, out_path=None):
        """Heatmap of positional importance (matplotlib-gated)."""
        res = self.position_importance(sequence, window_size)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return None
        fig, ax = plt.subplots(figsize=(12, 2.2))
        ax.imshow(res.importance[None, :], aspect="auto", cmap="viridis")
        ax.set_yticks([])
        ax.set_xlabel(f"window index (size {window_size})")
        ax.set_title(f"class {res.predicted_class} (p={res.base_prob:.3f}) positional importance")
        fig.tight_layout()
        if out_path is not None:
            fig.savefig(out_path)
            plt.close(fig)
        return fig


# Backward-compatible name (reference: motif.py:7 Mamba2Analyzer)
Mamba2Analyzer = ModelAnalyzer


def analyze_sequence(model, params, sequence: str, tokenizer=None, window_size: int = 10, top_k: int = 5) -> dict:
    """One-call analysis (reference: motif.py:150-172 analyze_mamba2_sequence)."""
    analyzer = ModelAnalyzer(model, params, tokenizer)
    probs = analyzer.predict_proba(sequence)
    return {
        "probabilities": probs.tolist(),
        "predicted_class": int(probs.argmax()),
        "important_windows": analyzer.find_important_windows(sequence, window_size, top_k),
    }


analyze_mamba2_sequence = analyze_sequence
