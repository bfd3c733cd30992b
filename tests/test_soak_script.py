"""scripts/soak_tpu.py CPU smoke: the serving-soak harness itself must stay
runnable (mixed load + cancellation over the continuous engine, JSON stats
artifact) so the real-TPU soak never bit-rots."""

import json
import subprocess
import sys


def test_soak_script_cpu_smoke(tmp_path):
    out = subprocess.run(
        [sys.executable, "scripts/soak_tpu.py", "--cpu",
         "--requests", "5", "--slots", "2", "--segment", "2",
         "--max-new", "12", "--json", str(tmp_path / "soak.json")],
        capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout[out.stdout.index("{"):])
    assert report["errors"] == 0
    for wave in (report["cold"], report["steady"]):
        assert wave["completed"] + wave["cancelled"] == 5
        assert wave["completed"] >= 3 and wave["served_audio_s"] > 0
    # Steady state must not be slower than the compile-paying cold wave.
    assert report["steady"]["wall_s"] <= report["cold"]["wall_s"] * 1.5
