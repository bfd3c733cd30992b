"""scripts/acceptance.py --tiny must be green end-to-end: it is the
real-weights runbook (VERDICT r2 item 5) and CI proves every stage wiring
on the parity fixture, including the reference-in-the-loop comparison."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_acceptance_tiny_green(tmp_path):
    out = tmp_path / "report.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "acceptance.py"),
         "--tiny", "--out", str(out)],
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    report = json.loads(out.read_text())
    assert report["ok"] is True
    stages = {s["stage"]: s for s in report["stages"]}
    assert stages["load"]["status"] == "PASS"
    assert stages["parity"]["status"] == "PASS"
    # the fixture run must exercise the ACTUAL reference package
    assert "reference token-exact" in stages["parity"]["detail"]
    assert stages["synthesize"]["status"] == "PASS"
    # device stages skip cleanly on CPU
    assert stages["bench"]["status"] in ("PASS", "SKIP")
    assert stages["streaming"]["status"] in ("PASS", "SKIP")
    # the Jacobi convergence histogram runs everywhere (numerics, not perf)
    assert stages["jacobi_conv"]["status"] == "PASS"
    conv = report["jacobi_convergence"]
    assert conv["frames"] > 0
    assert sum(conv["iters_histogram"].values()) == conv["frames"]
    assert conv["decision"]  # a decision string is always emitted
