"""DNA tokenizers with the exact id contract of the reference implementation.

Behavioral contract (reference: chimeralm/data/tokenizer.py):

* Special tokens / ids: ``[CLS]=0 [SEP]=1 [BOS]=2 [MASK]=3 [PAD]=4
  [RESERVED]=5 [UNK]=6``; characters A,C,G,T,N get ids 7..11
  (reference: tokenizer.py:230-239).  Golden value:
  ``encode("ATCG") == [0, 7, 10, 8, 9, 1]`` (reference: tests/test_tokenzier.py:11-16).
* ``encode(seq, truncation=True, max_length=m)`` truncates the character ids
  to ``m - 2`` and then wraps with CLS/SEP so the total length is ``<= m``
  (HuggingFace ``longest_first`` semantics).
* ``max_len_single_sentence == model_max_length - 2``.
* K-mer tokenizer: overlapping k-mers over the sorted k-mer vocabulary of
  the alphabet ``A,C,G,N,T`` (sorted), ids starting at 7
  (reference: tokenizer.py:330-447; golden ids in tests/test_tokenzier.py:24-38).

This module is numpy-only: no torch, no transformers.  Hot-path batch
tokenization is vectorized with a byte->id lookup table; the C++ streaming
tokenizer in ``chimeralm_tpu.io.native`` supersedes it for production BAM
streaming.
"""

from __future__ import annotations

import itertools

import numpy as np

id2label = {0: "NEGATIVE", 1: "POSITIVE"}
label2id = {"NEGATIVE": 0, "POSITIVE": 1}

IGNORE_INDEX = -100
MODEL_SEQ_INPUT = "input_ids"
MODEL_QUAL_INPUT = "input_quals"
MODEL_LABEL_INPUT = "labels"
PAD_QUAL = 0

SEQ_FEATURE = "seq"
QUAL_FEATURE = "qual"
ID_FEATURE = "id"
QUAL_OFFSET = 33

SPECIAL_TOKENS = {
    "[CLS]": 0,
    "[SEP]": 1,
    "[BOS]": 2,
    "[MASK]": 3,
    "[PAD]": 4,
    "[RESERVED]": 5,
    "[UNK]": 6,
}

CLS_ID = 0
SEP_ID = 1
BOS_ID = 2
MASK_ID = 3
PAD_ID = 4
RESERVED_ID = 5
UNK_ID = 6

#: max supported context per HyenaDNA backbone flavor
#: (reference: tokenizer.py:38-44)
HYENA_MAX_LENGTHS = {
    "hyenadna-tiny-1k-seqlen": 1024,
    "hyenadna-small-32k-seqlen": 32768,
    "hyenadna-medium-160k-seqlen": 160000,
    "hyenadna-medium-450k-seqlen": 450000,
    "hyenadna-large-1m-seqlen": 1_000_000,
}


def parse_target(name: str) -> tuple[str, int]:
    """Split ``"read|1"`` into ``("read", 1)``; default target is ``-1``.

    Reference: tokenizer.py:25-33.
    """
    content = name.split("|")
    if len(content) < 2:
        return content[0], -1
    rid, target = content
    return rid, int(target)


class _BaseDnaTokenizer:
    """Shared mechanics of the character/k-mer tokenizers."""

    def __init__(self, model_max_length: int | None = None, padding_side: str = "right"):
        if padding_side not in ("right", "left"):
            raise ValueError(f"padding_side must be 'right' or 'left', got {padding_side!r}")
        self.model_max_length = model_max_length
        self.padding_side = padding_side
        self._vocab_str_to_int: dict[str, int] = {}
        self._vocab_int_to_str: dict[int, str] = {}

    # -- vocab ------------------------------------------------------------
    @property
    def vocab_size(self) -> int:
        return len(self._vocab_str_to_int)

    def get_vocab(self) -> dict[str, int]:
        return dict(self._vocab_str_to_int)

    @property
    def all_special_tokens(self) -> list[str]:
        return list(SPECIAL_TOKENS)

    @property
    def cls_token_id(self) -> int:
        return CLS_ID

    @property
    def sep_token_id(self) -> int:
        return SEP_ID

    @property
    def pad_token_id(self) -> int:
        return PAD_ID

    @property
    def unk_token_id(self) -> int:
        return UNK_ID

    @property
    def num_special_tokens_to_add(self) -> int:
        return 2  # CLS + SEP

    @property
    def max_len_single_sentence(self) -> int:
        """Max character-token count once CLS/SEP are reserved."""
        if self.model_max_length is None:
            # mirror HF's "very large number" default so downstream
            # `max_length=tokenizer.max_len_single_sentence` stays a no-op
            return int(1e30)
        return self.model_max_length - self.num_special_tokens_to_add

    # -- tokenize/encode ---------------------------------------------------
    def _tokenize(self, text: str) -> list[str]:
        raise NotImplementedError

    def convert_tokens_to_string(self, tokens: list[str]) -> str:
        raise NotImplementedError

    def _convert_token_to_id(self, token: str) -> int:
        return self._vocab_str_to_int.get(token, UNK_ID)

    def _convert_id_to_token(self, index: int) -> str:
        return self._vocab_int_to_str[index]

    def convert_ids_to_tokens(self, ids) -> list[str]:
        return [self._convert_id_to_token(int(i)) for i in ids]

    def convert_tokens_to_ids(self, tokens) -> list[int]:
        if isinstance(tokens, str):
            return self._convert_token_to_id(tokens)
        return [self._convert_token_to_id(t) for t in tokens]

    def build_inputs_with_special_tokens(self, token_ids_0, token_ids_1=None) -> list[int]:
        result = [CLS_ID] + list(token_ids_0) + [SEP_ID]
        if token_ids_1 is not None:
            result += list(token_ids_1) + [SEP_ID]
        return result

    def get_special_tokens_mask(self, token_ids_0, token_ids_1=None) -> list[int]:
        result = ([0] * len(token_ids_0)) + [1]
        if token_ids_1 is not None:
            result += ([0] * len(token_ids_1)) + [1]
        return result

    def _effective_max_length(self, truncation: bool, max_length: int | None) -> int | None:
        if not truncation:
            return None
        if max_length is not None:
            return max_length
        return self.model_max_length

    def encode(self, text: str, truncation: bool = False, max_length: int | None = None) -> list[int]:
        """Tokenize and wrap with CLS/SEP; total length <= max_length."""
        ids = [self._convert_token_to_id(t) for t in self._tokenize(text)]
        limit = self._effective_max_length(truncation, max_length)
        if limit is not None:
            keep = max(limit - self.num_special_tokens_to_add, 0)
            ids = ids[:keep]
        return self.build_inputs_with_special_tokens(ids)

    def __call__(
        self,
        text,
        truncation: bool = False,
        max_length: int | None = None,
        padding=False,
    ) -> dict:
        """HF-style call. ``model_input_names`` is just input_ids: no attention
        mask is emitted (reference: tokenizer.py:193 ``model_input_names``).

        ``padding=True`` on single sequences is a no-op (matching HF); batch
        inputs are padded to the batch max when requested.
        """
        if isinstance(text, str):
            return {MODEL_SEQ_INPUT: self.encode(text, truncation=truncation, max_length=max_length)}
        encoded = [self.encode(t, truncation=truncation, max_length=max_length) for t in text]
        if padding:
            encoded = self.pad_ids(encoded)
        return {MODEL_SEQ_INPUT: encoded}

    def pad_ids(self, sequences: list[list[int]], pad_to: int | None = None) -> list[list[int]]:
        """Pad ragged id lists to ``pad_to`` (default: batch max) with PAD=4."""
        longest = max((len(s) for s in sequences), default=0)
        target = longest if pad_to is None else max(pad_to, longest)
        out = []
        for s in sequences:
            fill = [PAD_ID] * (target - len(s))
            out.append(s + fill if self.padding_side == "right" else fill + s)
        return out

    def decode(self, token_ids, skip_special_tokens: bool = True, **_kwargs) -> str:
        """Decode ids back to a sequence string (reference: tokenizer.py:312-327)."""
        if isinstance(token_ids, dict):
            token_ids = token_ids[MODEL_SEQ_INPUT]
        if hasattr(token_ids, "tolist"):
            token_ids = token_ids.tolist()
        if isinstance(token_ids, list) and token_ids and isinstance(token_ids[0], list):
            token_ids = token_ids[0]
        tokens = [self._convert_id_to_token(int(i)) for i in token_ids]
        if skip_special_tokens:
            tokens = [t for t in tokens if t not in SPECIAL_TOKENS]
        return self.convert_tokens_to_string(tokens)


class CharacterTokenizer(_BaseDnaTokenizer):
    """Character-level DNA tokenizer (vocab 12).

    Vectorized via a 256-entry byte lookup table; unknown bytes map to UNK.
    Reference: chimeralm/data/tokenizer.py:190-327.
    """

    characters = ("A", "C", "G", "T", "N")

    #: byte -> token id LUT shared by all instances (and mirrored in C++)
    BYTE_LUT = np.full(256, UNK_ID, dtype=np.int32)
    for _i, _ch in enumerate(characters):
        BYTE_LUT[ord(_ch)] = 7 + _i
    del _i, _ch

    def __init__(self, model_max_length: int | None = None, padding_side: str = "right", **_kwargs):
        super().__init__(model_max_length=model_max_length, padding_side=padding_side)
        self._vocab_str_to_int = {
            **SPECIAL_TOKENS,
            **{ch: i + 7 for i, ch in enumerate(self.characters)},
        }
        self._vocab_int_to_str = {v: k for k, v in self._vocab_str_to_int.items()}

    def _tokenize(self, text: str) -> list[str]:
        return list(text)

    def convert_tokens_to_string(self, tokens: list[str]) -> str:
        return "".join(tokens)

    # -- fast paths --------------------------------------------------------
    def encode(self, text: str, truncation: bool = False, max_length: int | None = None) -> list[int]:
        return self.encode_np(text, truncation=truncation, max_length=max_length).tolist()

    def encode_np(self, text: str, truncation: bool = False, max_length: int | None = None) -> np.ndarray:
        """Vectorized encode returning an int32 array (with CLS/SEP)."""
        raw = np.frombuffer(text.encode("ascii", errors="replace"), dtype=np.uint8)
        ids = self.BYTE_LUT[raw]
        limit = self._effective_max_length(truncation, max_length)
        if limit is not None:
            ids = ids[: max(limit - 2, 0)]
        out = np.empty(len(ids) + 2, dtype=np.int32)
        out[0] = CLS_ID
        out[1:-1] = ids
        out[-1] = SEP_ID
        return out


class KmerTokenizer(_BaseDnaTokenizer):
    """Overlapping k-mer tokenizer (reference: tokenizer.py:330-499).

    Vocabulary is the lexicographically sorted set of all k-mers over the
    alphabet ``A,C,G,N,T`` (note: *sorted* alphabet, so N sorts before T),
    ids starting at 7.
    """

    nucleotides = ("A", "C", "G", "T", "N")

    def __init__(
        self,
        k: int = 6,
        model_max_length: int | None = None,
        padding_side: str = "right",
        **_kwargs,
    ):
        super().__init__(model_max_length=model_max_length, padding_side=padding_side)
        self.k = k
        kmers = sorted("".join(p) for p in itertools.product(self.nucleotides, repeat=k))
        self._vocab_str_to_int = {
            **SPECIAL_TOKENS,
            **{kmer: i + 7 for i, kmer in enumerate(kmers)},
        }
        self._vocab_int_to_str = {v: kk for kk, v in self._vocab_str_to_int.items()}

    def _tokenize(self, text: str) -> list[str]:
        kmers = [text[i : i + self.k] for i in range(len(text) - self.k + 1)]
        if not kmers:
            # sequences shorter than k are N-padded up to one k-mer
            return [text + "N" * (self.k - len(text)) if len(text) < self.k else text[: self.k]]
        return kmers

    def convert_tokens_to_string(self, tokens: list[str]) -> str:
        if not tokens:
            return ""
        sequence = tokens[0]
        for token in tokens[1:]:
            sequence += token[-1]
        return sequence


def load_tokenizer_from_hyena_model(model_name: str) -> CharacterTokenizer:
    """Build the character tokenizer configured for a HyenaDNA flavor.

    The upstream loader downloads ``LongSafari/{name}-hf``'s tokenizer, which
    is this exact character tokenizer with ``model_max_length`` from a fixed
    table (reference: tokenizer.py:36-55).  We construct it locally: same
    vocab, same truncation behavior, no network round-trip.
    """
    if model_name not in HYENA_MAX_LENGTHS:
        msg = f"Model name {model_name} not found in available models."
        raise ValueError(msg)
    return CharacterTokenizer(model_max_length=HYENA_MAX_LENGTHS[model_name], padding_side="left")


def _normalized_quals(qual, seq_len: int, max_length: int) -> np.ndarray:
    """L2-normalized qualities with one trailing PAD slot.

    Reference: tokenizer.py:71-78 (torch.nn.functional.normalize, dim=0).
    """
    qual = np.asarray(qual, dtype=np.float32)
    if seq_len >= max_length:
        quals = np.concatenate([qual[: max_length - 1], np.array([PAD_QUAL], dtype=np.float32)])
    else:
        quals = np.concatenate([qual, np.array([PAD_QUAL], dtype=np.float32)])
    norm = np.linalg.norm(quals)
    return quals / max(norm, 1e-12)


def tokenize_and_align_labels_and_quals(
    data: dict,
    tokenizer: _BaseDnaTokenizer,
    max_length: int,
    include_qual: bool = False,
    seq_feature: str = SEQ_FEATURE,
    qual_feature: str = QUAL_FEATURE,
    id_feature: str = ID_FEATURE,
) -> dict:
    """Train/eval-time example transform (reference: tokenizer.py:58-82)."""
    out = tokenizer(data[seq_feature], truncation=True, max_length=max_length, padding=True)
    if include_qual:
        out[MODEL_QUAL_INPUT] = _normalized_quals(data[qual_feature], len(data[seq_feature]), max_length)
    _rid, target = parse_target(data[id_feature])
    out[MODEL_LABEL_INPUT] = target
    return out


def encode_read_id(rid: str, max_id_length: int = 256) -> list[int]:
    """Pack a read name as ``[len, *ord(chars)]`` zero-padded to 256.

    Reference: tokenizer.py:108-113.  The length prefix and chars are later
    stored as int8, so values wrap at 128 exactly like the reference's
    ``torch.tensor(..., dtype=torch.int8)``.
    """
    new_id = [len(rid)] + [ord(char) for char in rid]
    if len(new_id) > max_id_length:
        return new_id[:max_id_length]
    return new_id + [0] * (max_id_length - len(new_id))


def tokenize_and_align_labels_and_quals_ids(
    data: dict,
    tokenizer: _BaseDnaTokenizer,
    max_length: int,
    include_qual: bool = False,
    seq_feature: str = SEQ_FEATURE,
    qual_feature: str = QUAL_FEATURE,
    id_feature: str = ID_FEATURE,
    max_id_length: int = 256,
) -> dict:
    """Predict-time example transform carrying the packed read id.

    Reference: tokenizer.py:85-114.
    """
    out = tokenizer(data[seq_feature], truncation=True, max_length=max_length, padding=True)
    if include_qual:
        out[MODEL_QUAL_INPUT] = _normalized_quals(data[qual_feature], len(data[seq_feature]), max_length)
    out["id"] = encode_read_id(data[id_feature], max_id_length)
    out[MODEL_LABEL_INPUT] = -1
    return out
