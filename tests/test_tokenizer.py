"""Tokenizer contract tests — golden values from the reference suite.

Reference: tests/test_tokenzier.py (golden ids), chimeralm/data/tokenizer.py.
"""

import numpy as np

from chimeralm_tpu.data.collator import DataCollator
from chimeralm_tpu.data.tokenizer import (
    CharacterTokenizer,
    KmerTokenizer,
    encode_read_id,
    load_tokenizer_from_hyena_model,
    parse_target,
    tokenize_and_align_labels_and_quals,
    tokenize_and_align_labels_and_quals_ids,
)


def test_character_tokenizer_golden():
    sequence = "ATCG"
    tokenizer = CharacterTokenizer()

    encoded = tokenizer.encode(sequence)
    tokens = tokenizer.convert_ids_to_tokens(encoded)
    decoded = tokenizer.decode(encoded)

    assert encoded == [0, 7, 10, 8, 9, 1]
    assert tokens == ["[CLS]", "A", "T", "C", "G", "[SEP]"]
    assert decoded == sequence


def test_character_tokenizer_unknown_chars():
    tokenizer = CharacterTokenizer()
    assert tokenizer.encode("AXZ") == [0, 7, 6, 6, 1]


def test_character_tokenizer_truncation():
    sequence = "ATCG" * 10000
    tokenizer = CharacterTokenizer(model_max_length=30000)
    encoded = tokenizer.encode(sequence, truncation=True)
    assert len(encoded) == 30000
    assert encoded[0] == 0 and encoded[-1] == 1

    # max_length kwarg wins over model_max_length
    encoded = tokenizer.encode(sequence, truncation=True, max_length=10)
    assert len(encoded) == 10

    # no truncation without the flag
    assert len(tokenizer.encode(sequence)) == 40002


def test_max_len_single_sentence():
    assert CharacterTokenizer(model_max_length=32768).max_len_single_sentence == 32766


def test_kmer_tokenizer_golden():
    sequence = "ATCGCGATCG"
    tokenizer = KmerTokenizer(k=3)

    encoded = tokenizer.encode(sequence)
    tokens = tokenizer.convert_ids_to_tokens(encoded)
    decoded = tokenizer.decode(encoded)

    assert encoded == [0, 28, 114, 43, 64, 42, 61, 28, 114, 1]
    assert tokens == ["[CLS]", "ATC", "TCG", "CGC", "GCG", "CGA", "GAT", "ATC", "TCG", "[SEP]"]
    assert decoded == "ATCGCGATCG"


def test_kmer_short_sequence_padded():
    tokenizer = KmerTokenizer(k=6)
    encoded = tokenizer.encode("ACG")
    # one k-mer, N-padded
    tokens = tokenizer.convert_ids_to_tokens(encoded)
    assert tokens == ["[CLS]", "ACGNNN", "[SEP]"]


def test_hyena_tokenizer_loader():
    tok = load_tokenizer_from_hyena_model("hyenadna-small-32k-seqlen")
    assert tok.model_max_length == 32768
    encoded = tok.encode("ATCG" * 10000, truncation=True)
    assert len(encoded) == 32768
    try:
        load_tokenizer_from_hyena_model("nope")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_parse_target():
    assert parse_target("read1|1") == ("read1", 1)
    assert parse_target("read1|0") == ("read1", 0)
    assert parse_target("read1") == ("read1", -1)


def test_encode_read_id_roundtrip():
    rid = "m84039_240622_113450_s1/88868179/ccs"
    packed = encode_read_id(rid)
    assert len(packed) == 256
    assert packed[0] == len(rid)
    assert bytes(packed[1 : 1 + len(rid)]).decode() == rid


def test_collator_right_padding():
    tok = CharacterTokenizer(model_max_length=100, padding_side="right")
    feats = [
        tokenize_and_align_labels_and_quals(
            {"seq": "ACGT" * n, "id": f"r{n}|{n % 2}", "qual": [30] * (4 * n)},
            tok,
            max_length=tok.max_len_single_sentence,
        )
        for n in (1, 3, 5)
    ]
    batch = DataCollator(tok)(feats)
    assert batch["input_ids"].shape == (3, 22)
    assert batch["input_ids"].dtype == np.int32
    assert batch["labels"].tolist() == [1, 1, 1]
    # right padding: trailing PAD=4
    assert batch["input_ids"][0, -1] == 4
    assert batch["input_ids"][0, 0] == 0


def test_collator_left_padding():
    tok = CharacterTokenizer(model_max_length=100, padding_side="left")
    feats = [
        tokenize_and_align_labels_and_quals(
            {"seq": "ACGT" * n, "id": f"r{n}|0", "qual": [30] * (4 * n)},
            tok,
            max_length=tok.max_len_single_sentence,
        )
        for n in (1, 5)
    ]
    batch = DataCollator(tok)(feats)
    assert batch["input_ids"][0, 0] == 4  # leading PAD
    assert batch["input_ids"][0, -1] == 1  # SEP at end


def test_collator_truncation_boundary():
    # model_max_length=100 -> map passes max_length=98 -> total tokens 98
    # (golden: tests/test_data_module.py asserts (12, 98) for mml=100)
    tok = CharacterTokenizer(model_max_length=100, padding_side="left")
    feat = tokenize_and_align_labels_and_quals(
        {"seq": "A" * 500, "id": "r|1", "qual": [30] * 500},
        tok,
        max_length=tok.max_len_single_sentence,
    )
    assert len(feat["input_ids"]) == 98


def test_collator_predict_ids():
    tok = CharacterTokenizer(model_max_length=100)
    feats = [
        tokenize_and_align_labels_and_quals_ids(
            {"seq": "ACGT", "id": f"read_{i}", "qual": [30] * 4},
            tok,
            max_length=tok.max_len_single_sentence,
        )
        for i in range(2)
    ]
    batch = DataCollator(tok)(feats)
    assert batch["id"].shape == (2, 256)
    assert batch["id"].dtype == np.int8
    assert batch["labels"].tolist() == [-1, -1]
    from chimeralm_tpu.runtime.writers import resume_read_name

    assert resume_read_name(batch["id"][0]) == "read_0"


def test_quals_normalized():
    tok = CharacterTokenizer(model_max_length=100)
    feat = tokenize_and_align_labels_and_quals(
        {"seq": "ACGT", "id": "r|0", "qual": [10, 20, 30, 40]},
        tok,
        max_length=tok.max_len_single_sentence,
        include_qual=True,
    )
    q = np.asarray(feat["input_quals"])
    assert q.shape == (5,)  # one PAD slot appended
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, rtol=1e-6)


def test_bucketing_module():
    from chimeralm_tpu.data.bucketing import bucket_for, bucketize, padding_waste

    assert bucket_for(100) == 512
    assert bucket_for(513) == 1024
    assert bucket_for(999999) == 32768
    batches = list(bucketize(range(10), lambda x: 100 * (x + 1), buckets=(256, 512, 1024), batch_size=2))
    assert sum(len(b) for _bk, b in batches) == 10
    assert 0 <= padding_waste([100, 500, 700]) < 1
