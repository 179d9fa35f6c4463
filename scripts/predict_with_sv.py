"""Join per-read predictions with SV-support annotations.

Reference: scripts/predict_with_sv.py — emits ``read\\tpred\\tsvtype|NA``.
Predictions come from a folder of ``*.txt`` label shards (PredictionWriter)
or a consolidated predictions.txt.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from chimeralm_tpu.runtime.writers import load_predictions_from_folder, load_predicts


def load_sv(path: str | Path) -> dict[str, str]:
    res = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split("\t")
            if len(parts) == 2:
                res[parts[0]] = parts[1]
    return res


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("predict_path", type=Path)
    p.add_argument("sv_path", type=Path)
    p.add_argument("--output", type=Path, default=Path("predict_with_sv.text"))
    a = p.parse_args(argv)
    predicts = (
        load_predictions_from_folder(a.predict_path)
        if a.predict_path.is_dir()
        else load_predicts(a.predict_path)
    )
    sv = load_sv(a.sv_path)
    with a.output.open("w") as f:
        for read, predict in predicts.items():
            f.write(f"{read}\t{predict}\t{sv.get(read, 'NA')}\n")
    print(a.output)


if __name__ == "__main__":
    main()
