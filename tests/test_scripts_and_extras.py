"""Tests for the scripts/ pipeline ports, explain module, and UI predictor."""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))

from chimeralm_tpu.models.hyena import HyenaDnaClassifier, tiny_config


@pytest.fixture(scope="module")
def tiny():
    model = HyenaDnaClassifier(tiny_config())
    params = model.init(jax.random.PRNGKey(0), np.zeros((1, 64), np.int32))["params"]
    return model, params


def test_data_select_script(tmp_path):
    import data as data_script

    sup = tmp_path / "sup.txt"
    lines = [f"pos_{i}\t0" for i in range(30)] + [f"neg_{i}\t{1 + i % 3}" for i in range(30)]
    sup.write_text("\n".join(lines) + "\n")
    data_script.select(str(sup), str(tmp_path / "out"), total_data=40, seed=0)
    train = (tmp_path / "out/train.txt").read_text().strip().splitlines()
    val = (tmp_path / "out/validation.txt").read_text().strip().splitlines()
    test = (tmp_path / "out/test.txt").read_text().strip().splitlines()
    assert len(train) + len(val) + len(test) == 40
    n_pos = sum(1 for l in train + val + test if l.endswith("True"))
    assert n_pos == 24  # 60% positive
    for line in train:
        name, flag = line.split("\t")
        assert (flag == "True") == name.startswith("pos_")


def test_extract_script(tmp_path):
    import extract as extract_script

    from chimeralm_tpu.io.fastq import read_fastq

    recs = list(read_fastq("tests/data/test.fastq"))
    (tmp_path / "train.txt").write_text(f"{recs[0].name}\tTrue\n{recs[1].name}\tFalse\n")
    (tmp_path / "validation.txt").write_text(f"{recs[2].name}\tTrue\n")
    (tmp_path / "test.txt").write_text(f"{recs[3].name}\tFalse\n")
    stats = extract_script.extract(
        "tests/data/test.fastq",
        str(tmp_path / "train.txt"),
        str(tmp_path / "validation.txt"),
        str(tmp_path / "test.txt"),
        str(tmp_path),
    )
    assert stats["train"] == 2 and stats["validation"] == 1 and stats["test"] == 1
    out = list(read_fastq(tmp_path / "train.fastq"))
    assert out[0].name == recs[0].name + "|1"
    assert out[1].name == recs[1].name + "|0"


def test_get_result_scripts(tmp_path):
    import get_result_from_predictions as grp

    from chimeralm_tpu.data.tokenizer import encode_read_id
    from chimeralm_tpu.runtime.writers import CustomWriter

    # raw-dump path
    w = CustomWriter(tmp_path / "dumps")
    logits = np.asarray([[0.1, 0.9], [2.0, 0.0]])
    ids = np.asarray([encode_read_id("readA"), encode_read_id("readB")], np.int64)
    w.write_batch(logits, [-1, -1], ids, 0)
    total, ones = grp.from_dumps(tmp_path / "dumps", tmp_path / "out.txt")
    assert (total, ones) == (2, 1)
    assert "readA\t1" in (tmp_path / "out.txt").read_text()

    # txt-collect path
    (tmp_path / "txts").mkdir()
    (tmp_path / "txts/0_0.txt").write_text("a\t0\n")
    (tmp_path / "txts/0_1.txt").write_text("b\t1\n")
    out = grp.collect(tmp_path / "txts", tmp_path / "collected.txt")
    assert sorted(out.read_text().strip().splitlines()) == ["a\t0", "b\t1"]


def test_export_model_roundtrip(tmp_path, tiny):
    """export -> safetensors -> convert must reproduce the params."""
    import export_model

    from chimeralm_tpu.models.convert import convert_checkpoint, validate_against
    from chimeralm_tpu.models.lm import LoadedModel, save_pretrained

    model, params = tiny
    loaded = LoadedModel(model, params, tiny_config())
    save_pretrained(loaded, tmp_path / "export")
    export_model._export_safetensors(params, tmp_path / "export/model.safetensors")

    converted = convert_checkpoint(tmp_path / "export/model.safetensors")
    problems = validate_against(converted, params)
    assert not problems, problems[:5]
    flat_a = jax.tree.leaves(converted)
    flat_b = jax.tree.leaves(params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_explain_importance(tiny):
    from chimeralm_tpu.data.tokenizer import CharacterTokenizer
    from chimeralm_tpu.explain import ModelAnalyzer, analyze_sequence

    model, params = tiny
    tok = CharacterTokenizer(model_max_length=256)
    analyzer = ModelAnalyzer(model, params, tok)
    seq = "ACGT" * 30
    probs = analyzer.predict_proba(seq)
    assert probs.shape == (2,) and abs(probs.sum() - 1) < 1e-5

    res = analyzer.position_importance(seq, window_size=16, stride=16)
    assert len(res.positions) == len(res.importance)
    assert np.isfinite(res.importance).all()

    windows = analyzer.find_important_windows(seq, window_size=16, top_k=3)
    assert len(windows) == 3
    assert all(set(w["subsequence"]) <= set("ACGTN") for w in windows)

    report = analyze_sequence(model, params, seq, tok, window_size=16, top_k=2)
    assert report["predicted_class"] in (0, 1)
    assert len(report["important_windows"]) == 2

    acts = analyzer.capture_activations("ACGT" * 10)
    assert acts  # intermediates captured without hooks


def test_ui_predictor(tiny, tmp_path):
    from chimeralm_tpu.models.lm import LoadedModel
    from chimeralm_tpu.ui import ChimeraLMPredictor

    model, params = tiny
    pred = ChimeraLMPredictor(loaded=LoadedModel(model, params, tiny_config()))
    ok, msg = pred.validate_sequence("ACGTxx")
    assert not ok and "Invalid characters" in msg
    # lowercase accepted and uppercased (reference: ui.py:43-48)
    ok, seq = pred.validate_sequence("acgtn")
    assert ok and seq == "ACGTN"
    out = pred.predict("ACGT" * 20)
    assert out["verdict"] in ("Biological", "Chimeric Artifact")
    assert abs(sum(out["probabilities"].values()) - 1) < 1e-5
    assert pred.predict("")["error"] == "Empty sequence"


def test_ui_format_result_and_figure(tiny):
    from chimeralm_tpu.models.lm import LoadedModel
    from chimeralm_tpu.ui import ChimeraLMPredictor, confidence_figure, format_result

    model, params = tiny
    pred = ChimeraLMPredictor(loaded=LoadedModel(model, params, tiny_config()))
    result = pred.predict("ACGT" * 50)
    text = format_result(result)
    # reference output format (ui.py:90-95): prediction, confidence, breakdown
    assert "**Prediction:**" in text and "**Confidence:**" in text
    assert "Confidence Breakdown" in text
    assert "- Biological:" in text and "- Chimeric Artifact:" in text
    assert format_result({"error": "boom"}) == "**Error:** boom"

    # chart helper: plotly or matplotlib, whichever is importable
    fig = confidence_figure(result["probabilities"], result["verdict"])
    assert fig is not None
    # empty/error case still yields a figure object (reference: ui.py:165-194)
    assert confidence_figure(None, None) is not None


def test_ui_examples_are_valid_sequences():
    from chimeralm_tpu.ui import EXAMPLES, ChimeraLMPredictor

    for (seq,) in EXAMPLES:
        ok, _ = ChimeraLMPredictor.validate_sequence(seq)
        assert ok


def test_ui_create_interface_gated(tiny):
    """create_interface builds (or cleanly refuses) depending on gradio."""
    pytest.importorskip("gradio")
    from chimeralm_tpu.models.lm import LoadedModel
    from chimeralm_tpu.ui import ChimeraLMPredictor, create_interface

    model, params = tiny
    pred = ChimeraLMPredictor(loaded=LoadedModel(model, params, tiny_config()))
    demo = create_interface(pred)
    assert demo is not None


def test_read_len_script(capsys):
    import read_len

    read_len.cmd_bam(Path("tests/data/test_chimric_reads.bam"), min_mapq=0)
    out = capsys.readouterr().out
    assert "n=100" in out


@pytest.mark.nightly
def test_shard_eval_script(tmp_path):
    """scripts/shard_eval.sh: per-chunk eval.py runs + collect + merge.

    Reference parity for the hand-sharded operational drivers
    (scripts/runforp2.sh:52-76, getforp2.sh:26-56, collectp2.sh:5-13).
    """
    import subprocess

    import train as train_entry

    common = [
        "data.train_data_path=tests/data/tests.parquet",
        "data.tokenizer.model_max_length=128",
        "data.batch_size=8",
        "data.num_workers=0",
        "model.model.config._target_=chimeralm_tpu.models.hyena.tiny_config",
        f"paths.root_dir={tmp_path}",
        "extras.print_config=false",
    ]
    train_entry.main(["debug=fdr", "test=false", *common])
    ckpt = tmp_path / "logs/debug/runs/checkpoints/last.ckpt.msgpack"
    assert ckpt.exists()

    repo = Path(__file__).parent.parent
    out_base = tmp_path / "shards"
    chunk = repo / "tests/data/test_predict.parquet"
    proc = subprocess.run(
        ["bash", str(repo / "scripts/shard_eval.sh"), str(ckpt), str(out_base),
         str(chunk), str(chunk), "--", "trainer=cpu", *common],
        capture_output=True, text=True, timeout=900, cwd=repo,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    merged = out_base / "predicts.txt"
    lines = merged.read_text().splitlines()
    assert len(lines) == 50  # 25 reads x 2 chunks
    assert all("\t" in ln for ln in lines)

    # restartability: a re-run skips finished chunks and still merges
    proc2 = subprocess.run(
        ["bash", str(repo / "scripts/shard_eval.sh"), str(ckpt), str(out_base),
         str(chunk), str(chunk), "--", "trainer=cpu", *common],
        capture_output=True, text=True, timeout=300, cwd=repo,
    )
    assert proc2.returncode == 0, proc2.stdout + proc2.stderr
    assert "skipping" in proc2.stdout
    assert len(merged.read_text().splitlines()) == 50


def test_parity_drill_end_to_end(tmp_path):
    """The one-command real-weights parity drill runs green on the torch
    mirror's random weights (the stand-in until egress exists): convert,
    per-layer goldens, parity-mode CLI labels vs the torch pipeline, and the
    bf16-vs-f32 audit all pass, and an --expected mismatch is detected."""
    torch = pytest.importorskip("torch")
    import parity_drill

    from tests.torch_mirror import TINY_CFG, ChimeraLMTorch

    torch.manual_seed(11)
    tmodel = ChimeraLMTorch(TINY_CFG).eval()
    ckpt = tmp_path / "standin.pt"
    torch.save(tmodel.state_dict(), ckpt)

    report = parity_drill.run_drill(
        ckpt, Path(__file__).parent / "data" / "test_chimric_reads.bam",
        scale="tiny", audit_reads=24,
    )
    assert report["ok"], report
    assert report["stages"]["goldens"]["ok"]
    assert report["stages"]["cli_labels"]["n_mismatches"] == 0
    assert report["stages"]["precision_audit"]["n_flips"] == 0

    # a corrupted expected file must be flagged, not silently pass
    bad = tmp_path / "expected.txt"
    bad.write_text("this_read_does_not_exist\t1\n")
    report_bad = parity_drill.run_drill(
        ckpt, Path(__file__).parent / "data" / "test_chimric_reads.bam",
        scale="tiny", expected=bad, skip_audit=True,
    )
    assert not report_bad["ok"]
    assert report_bad["stages"]["cli_labels"]["n_mismatches"] > 0


def test_hard_synthetic_mode(tmp_path):
    """Round-5 de-saturated task: the clean adapter motif never appears in
    negatives (their junctions carry scrambled decoys), positives span a
    corruption continuum (some clean, some unrecognizably corrupted), and
    generation is deterministic."""
    import make_synthetic_dataset as synth

    rng = np.random.default_rng(3)
    pos = [synth.make_read_hard(rng, True) for _ in range(60)]
    neg = [synth.make_read_hard(rng, False) for _ in range(60)]
    assert all(synth.ADAPTER not in s for s in neg)
    n_clean = sum(synth.ADAPTER in s for s in pos)
    assert 0 < n_clean < len(pos), "corruption continuum collapsed"
    assert all(set(s) <= set("ACGT") for s in pos + neg)

    import pyarrow.parquet as pq

    p1 = synth.generate(60, tmp_path / "a.parquet", seed=5, mode="hard")
    p2 = synth.generate(60, tmp_path / "b.parquet", seed=5, mode="hard")
    a, b = pq.read_table(p1), pq.read_table(p2)
    assert a["seq"].to_pylist() == b["seq"].to_pylist()
    labels = {i.split("|")[1] for i in a["id"].to_pylist()}
    assert labels == {"0", "1"}
