"""CLI voice-clone surface (--ref-audio/--ref-text/--x-vector-only/
--voice-file/--save-voice): beyond the reference C CLI (CustomVoice-only),
matching this framework's API/server/demo coverage."""

import numpy as np
import jax.numpy as jnp
import pytest

from ckpt_fixture import make_checkpoint
from qwen_tts_tpu import cli
from qwen_tts_tpu.io.wav import read_wav, write_wav
from qwen_tts_tpu.pipeline import Qwen3TTSModel
from test_voice_clone import FakeTokenizer


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_clone_ckpt")
    make_checkpoint(str(d), with_encoders=True)
    return str(d)


@pytest.fixture()
def patched_cli(monkeypatch):
    """cli.main loads the model itself; inject the fake tokenizer and force
    f32 CPU (parity dtype) through from_pretrained."""
    orig = Qwen3TTSModel.from_pretrained.__func__

    def patched(cls, d, **kw):
        kw.setdefault("talker_dtype", jnp.float32)
        kw["load_tokenizer"] = False
        m = orig(cls, d, **kw)
        m.tokenizer = FakeTokenizer()
        return m

    monkeypatch.setattr(Qwen3TTSModel, "from_pretrained",
                        classmethod(patched))
    return cli.main


def _ref_wav(tmp_path):
    wav = (0.1 * np.sin(np.linspace(0, 150, 4800))).astype(np.float32)
    path = str(tmp_path / "ref.wav")
    write_wav(path, wav, 24000)
    return path, wav


def test_cli_icl_clone_matches_pipeline(ckpt, tmp_path, patched_cli):
    ref_path, ref_wav = _ref_wav(tmp_path)
    out = str(tmp_path / "clone.wav")
    voice = str(tmp_path / "voice.pt")
    rc = patched_cli([
        "-d", ckpt, "--text", "hi", "-l", "english",
        "--ref-audio", ref_path, "--ref-text", "ref",
        "--save-voice", voice,
        "--greedy", "--max-tokens", "4", "-o", out,
    ])
    assert rc == 0

    # Pipeline oracle for the same request.
    model = Qwen3TTSModel.from_pretrained(ckpt)  # patched: fake tokenizer
    want, sr = model.generate_voice_clone(
        "hi", model.create_voice_clone_prompt(ref_wav, ref_text="ref"),
        language="english", max_new_tokens=4,
        do_sample=False, subtalker_dosample=False,
    )
    got, got_sr = read_wav(out)
    assert got_sr == sr
    assert got.shape == want[0].shape
    np.testing.assert_allclose(got, want[0], atol=1.1 / 32768)  # PCM16 write

    # The saved voice file drives a second run without the reference audio.
    out2 = str(tmp_path / "clone2.wav")
    rc = patched_cli([
        "-d", ckpt, "--text", "hi", "-l", "english",
        "--voice-file", voice,
        "--greedy", "--max-tokens", "4", "-o", out2,
    ])
    assert rc == 0
    got2, _ = read_wav(out2)
    np.testing.assert_array_equal(got, got2)


def test_cli_xvector_only_clone(ckpt, tmp_path, patched_cli):
    ref_path, _ = _ref_wav(tmp_path)
    out = str(tmp_path / "xv.wav")
    rc = patched_cli([
        "-d", ckpt, "--text", "hi", "-l", "auto",
        "--ref-audio", ref_path, "--x-vector-only",
        "--greedy", "--max-tokens", "3", "-o", out,
    ])
    assert rc == 0
    wav, sr = read_wav(out)
    assert sr == 24000 and wav.shape[0] > 0 and np.isfinite(wav).all()
