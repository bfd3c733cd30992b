"""WER harness scoring math (scripts/eval_wer.py) — the reference's quality
metric protocol (SEED WER, README.md:489/555-578 there)."""

import importlib.util
import json
import os
import subprocess
import sys

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "eval_wer",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "eval_wer.py"),
)
eval_wer = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(eval_wer)


def test_edit_distance_ops():
    d, s, i, dl = eval_wer.edit_distance("abc".split(), "abc".split())
    assert (d, s, i, dl) == (0, 0, 0, 0)
    d, s, i, dl = eval_wer.edit_distance(list("kitten"), list("sitting"))
    assert d == 3 and s == 2 and i == 1 and dl == 0


def test_wer_scoring():
    pairs = [
        ("a", "the quick brown fox", "the quick brown fox"),
        ("b", "hello world", "hello word there"),  # 1 sub + 1 ins over 2 ref
    ]
    rep = eval_wer.score(pairs)
    assert rep["metric"] == "wer"
    # total errors 2 over 6 reference words
    assert abs(rep["value"] - 100.0 * 2 / 6) < 1e-3
    assert rep["substitutions"] == 1 and rep["insertions"] == 1


def test_normalization_and_cer():
    assert eval_wer.normalize_text("Hello, WORLD!") == ["hello", "world"]
    assert eval_wer.normalize_text("你好 世界", cer=True) == list("你好世界")
    rep = eval_wer.score([("a", "你好世界", "你早世界")], cer=True)
    assert rep["metric"] == "cer"
    assert abs(rep["value"] - 25.0) < 1e-6


def test_cli_scores_precomputed_hypotheses(tmp_path):
    man = tmp_path / "man.jsonl"
    hyp = tmp_path / "hyp.jsonl"
    rep = tmp_path / "rep.json"
    man.write_text(json.dumps({"id": 1, "text": "one two three"}) + "\n")
    hyp.write_text(json.dumps({"id": 1, "text": "one too three"}) + "\n")
    out = subprocess.run(
        [sys.executable, "scripts/eval_wer.py", "--manifest", str(man),
         "--hyp-jsonl", str(hyp), "--report", str(rep)],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    report = json.loads(rep.read_text())
    assert abs(report["value"] - 100.0 / 3) < 1e-3
