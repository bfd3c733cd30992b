"""HBM budget check (the reference's payload-budget gate mapped to TPU)."""

import json
import subprocess
import sys

import pytest

from ckpt_fixture import make_checkpoint


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("budget_ckpt")
    make_checkpoint(str(d))
    return str(d)


def _run(ckpt, *extra):
    out = subprocess.run(
        [sys.executable, "scripts/check_hbm_budget.py",
         "--model-dir", ckpt, *extra],
        capture_output=True, text=True, timeout=240,
    )
    return out


def test_tiny_fixture_fits(ckpt):
    out = _run(ckpt, "--batch", "4", "--max-new-tokens", "32")
    assert out.returncode == 0, out.stderr[-800:]
    rep = json.loads(out.stdout)
    assert rep["fits"] is True
    for k in ("weights_talker_bytes", "kv_talker_bytes",
              "codec_activation_peak_bytes"):
        assert rep[k] > 0


def test_over_budget_fails(ckpt):
    out = _run(ckpt, "--batch", "4096", "--max-new-tokens", "2048",
               "--hbm-gib", "0.001")
    assert out.returncode == 1
    assert "OVER BUDGET" in out.stderr
    assert json.loads(out.stdout)["fits"] is False


def test_serving_policy_is_smaller(ckpt):
    full = json.loads(_run(ckpt).stdout)
    srv = json.loads(_run(ckpt, "--serving").stdout)
    assert srv["weights_talker_bytes"] < full["weights_talker_bytes"]
