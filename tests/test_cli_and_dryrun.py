"""CLI end-to-end (tiny checkpoint) and the driver entry points."""

import os
import subprocess
import sys

import numpy as np
import pytest

from ckpt_fixture import make_checkpoint

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_ckpt")
    make_checkpoint(str(d))
    return str(d)


def _run_cli(args, cwd=REPO):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from qwen_tts_tpu.cli import main; import sys;"
        "sys.exit(main(sys.argv[1:]))"
    )
    return subprocess.run(
        [sys.executable, "-c", code, *args],
        capture_output=True, text=True, env=env, cwd=cwd, timeout=600,
    )


def test_cli_generates_wav(ckpt, tmp_path):
    out = str(tmp_path / "out.wav")
    ids = "1,2,3,10,11,12,13,4,5,1,2,3"
    r = _run_cli([
        "-d", ckpt, "-t", ids, "-s", "aiden", "-l", "english",
        "-o", out, "--greedy", "--fixed-codec-tokens", "4", "-v",
    ])
    assert r.returncode == 0, r.stderr
    assert os.path.exists(out)
    from qwen_tts_tpu.io.wav import read_wav

    wav, rate = read_wav(out)
    assert rate == 24000
    assert wav.shape[0] == 4 * 48  # 4 frames × tiny upsample 48


def test_cli_fixed_tokens_and_trace(ckpt, tmp_path):
    out = str(tmp_path / "out2.wav")
    r = _run_cli([
        "-d", ckpt, "-t", "1,2,3,10,11,4,5,1,2,3", "-o", out,
        "--fixed-codec-tokens", "3", "--greedy", "-v", "-v",
    ])
    assert r.returncode == 0, r.stderr
    assert "Token trace:" in r.stderr
    assert "Stop:" in r.stderr
    from qwen_tts_tpu.io.wav import read_wav

    wav, _ = read_wav(out)
    assert wav.shape[0] == 3 * 48  # 3 frames × tiny upsample 48


def test_dryrun_multichip_8_devices():
    """Same mechanism the driver uses (virtual CPU mesh)."""
    sys.path.insert(0, REPO)
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_lowers():
    """Trace+lower the flagship frame step (full compile is the driver's job
    and takes minutes on CPU at flagship dims — lowering catches all tracing
    and shape errors)."""
    sys.path.insert(0, REPO)
    import jax
    import __graft_entry__ as ge

    fn, args = ge.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None
