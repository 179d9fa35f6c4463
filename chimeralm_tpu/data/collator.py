"""Batch collation with the reference's padding semantics, in numpy.

Reference: chimeralm/data/tokenizer.py:136-187 (``DataCollator.torch_call``).

Output batch keys/dtypes (matching the reference tensor dtypes):

* ``input_ids``      int32   (B, L)  padded with PAD=4 on the tokenizer's side
* ``attention_mask`` int32   (B, L)  1 on real tokens (incl. CLS/SEP), 0 on pads
* ``id``             int8    (B, 256) packed read names (predict datasets only)
* ``labels``         int64   (B,)
* ``input_quals``    float32 (B, L) padded with PAD_QUAL=0 respecting side

``attention_mask`` drives the head's masked attention pooling — without it
the pooling softmax runs over pad positions too, making logits depend on
the pad amount (bucket/batch composition), which breaks the fast path's
padding-invariance guarantee.  The reference collator emits it as well
(chimeralm/data/tokenizer.py:152-159 pads the HF tokenizer's mask).

``pad_to_multiple_of`` is off by default for bit-parity with the reference
(pad to longest in batch); the fast bucketed path in
``chimeralm_tpu.data.bucketing`` sets it to tame XLA recompilation.
"""

from __future__ import annotations

import numpy as np

from chimeralm_tpu.data.tokenizer import (
    MODEL_QUAL_INPUT,
    MODEL_SEQ_INPUT,
    PAD_ID,
    PAD_QUAL,
)


class DataCollator:
    """Pads a list of feature dicts into dense numpy arrays."""

    def __init__(self, tokenizer, padding=True, max_length=None, pad_to_multiple_of=None):
        self.tokenizer = tokenizer
        self.padding = padding
        self.max_length = max_length
        self.pad_to_multiple_of = pad_to_multiple_of

    def _target_length(self, lengths: list[int]) -> int:
        target = max(lengths) if lengths else 0
        if self.padding == "max_length" and self.max_length is not None:
            target = self.max_length
        if self.pad_to_multiple_of:
            m = self.pad_to_multiple_of
            target = ((target + m - 1) // m) * m
        return target

    def __call__(self, features: list[dict]) -> dict[str, np.ndarray]:
        if not features:
            return {}
        label_name = "label" if "label" in features[0] else "labels"
        has_labels = label_name in features[0]
        has_quals = MODEL_QUAL_INPUT in features[0]
        has_ids = "id" in features[0]

        seqs = [np.asarray(f[MODEL_SEQ_INPUT], dtype=np.int32) for f in features]
        lengths = [len(s) for s in seqs]
        target = self._target_length(lengths)
        side = getattr(self.tokenizer, "padding_side", "right")

        input_ids = np.full((len(seqs), target), PAD_ID, dtype=np.int32)
        attention_mask = np.zeros((len(seqs), target), dtype=np.int32)
        for i, s in enumerate(seqs):
            if side == "right":
                input_ids[i, : len(s)] = s
                attention_mask[i, : len(s)] = 1
            else:
                input_ids[i, target - len(s) :] = s
                attention_mask[i, target - len(s) :] = 1

        batch: dict[str, np.ndarray] = {
            MODEL_SEQ_INPUT: input_ids,
            "attention_mask": attention_mask,
        }

        if has_ids:
            # int8 with wraparound, bit-matching torch.tensor(..., dtype=torch.int8)
            ids = np.asarray([list(f["id"]) for f in features], dtype=np.int64)
            batch["id"] = ids.astype(np.int8)

        if not has_labels:
            return batch
        batch[label_name] = np.asarray([f[label_name] for f in features], dtype=np.int64)

        if not has_quals:
            return batch
        quals = np.full((len(seqs), target), PAD_QUAL, dtype=np.float32)
        for i, f in enumerate(features):
            q = np.asarray(f[MODEL_QUAL_INPUT], dtype=np.float32)
            if side == "right":
                quals[i, : len(q)] = q
            else:
                quals[i, target - len(q) :] = q
        batch[MODEL_QUAL_INPUT] = quals
        return batch

    # Alias so call sites written against the reference API keep working.
    torch_call = __call__
