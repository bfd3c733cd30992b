"""End-to-end SFT script flow (the reference finetuning workflow,
finetuning/sft_12hz.py): JSONL → scripts/sft_12hz.py (train + export) →
reload the exported checkpoint → synthesize with the new baked speaker."""

import json
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from ckpt_fixture import make_checkpoint
from qwen_tts_tpu.pipeline import Qwen3TTSModel


@pytest.fixture(scope="module")
def base_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("sft_e2e_base")
    cfg = make_checkpoint(str(d))
    return str(d), cfg


def test_sft_script_trains_exports_and_speaks(base_ckpt, tmp_path):
    base_dir, cfg = base_ckpt
    g = cfg.talker.num_code_groups
    rng = np.random.default_rng(0)
    data = str(tmp_path / "train.jsonl")
    with open(data, "w") as f:
        for i in range(3):
            f.write(json.dumps({
                # Pre-tokenized rows (tokenizer-free path): ids already
                # template-trimmed, reference dataset.py:141 semantics.
                "text_ids": [1, 2, 3] + [10 + i, 11, 12 + i],
                "audio_codes": rng.integers(
                    0, cfg.talker.vocab_size // 2, (4 + i, g)
                ).tolist(),
                "speaker_embedding": rng.standard_normal(
                    cfg.talker.hidden_size
                ).round(4).tolist(),
            }) + "\n")

    out = subprocess.run(
        [sys.executable, "scripts/sft_12hz.py", "--cpu",
         "--model-path", base_dir, "--data", data,
         "--output-model-path", str(tmp_path / "out"),
         "--speaker-name", "myvoice",
         "--num-epochs", "1", "--batch-size", "2", "--lr", "1e-4"],
        capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "loss" in out.stdout and "saved" in out.stdout

    ft_dir = str(tmp_path / "out" / "checkpoint-epoch-0")
    model = Qwen3TTSModel.from_pretrained(
        ft_dir, talker_dtype=jnp.float32, load_tokenizer=False
    )
    assert (tmp_path / "out" / "train_state" / "meta.json").exists()
    assert "myvoice" in model.get_supported_speakers()
    from test_voice_clone import FakeTokenizer

    model.tokenizer = FakeTokenizer()
    wavs, sr = model.generate_custom_voice(
        "hello", "myvoice", "english",
        max_new_tokens=3, do_sample=False, subtalker_dosample=False,
    )
    assert sr == 24000
    assert wavs[0].shape[0] > 0 and np.isfinite(wavs[0]).all()


def _step0_loss(stdout: str) -> float:
    line = next(l for l in stdout.splitlines() if "step 0 |" in l)
    return float(line.split("loss")[1].split("(")[0])


def test_sft_script_mesh_sharded_matches_single_device(base_ckpt, tmp_path):
    """--dp 2 --tp 2 trains over a real 4-device mesh (realized TP plan +
    dp batch sharding; the last odd batch exercises loss-neutral dp
    padding) and must produce the single-device step-0 loss."""
    base_dir, cfg = base_ckpt
    g = cfg.talker.num_code_groups
    rng = np.random.default_rng(0)
    data = str(tmp_path / "train.jsonl")
    with open(data, "w") as f:
        for i in range(3):  # 3 examples, batch 2 -> final 1-row batch padded
            f.write(json.dumps({
                "text_ids": [1, 2, 3] + [10 + i, 11, 12 + i],
                "audio_codes": rng.integers(
                    0, cfg.talker.vocab_size // 2, (4 + i, g)
                ).tolist(),
            }) + "\n")

    def run(extra):
        out = subprocess.run(
            [sys.executable, "scripts/sft_12hz.py", "--cpu",
             "--model-path", base_dir, "--data", data,
             "--output-model-path",
             str(tmp_path / ("out_" + "_".join(extra) if extra else "out_1")),
             "--speaker-name", "meshvoice",
             "--num-epochs", "1", "--batch-size", "2", "--lr", "1e-4"]
            + extra,
            capture_output=True, text=True, timeout=1200,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return out.stdout

    solo = run([])
    sharded = run(["--dp", "2", "--tp", "2"])
    assert "mesh: dp=2 tp=2 over 4 devices" in sharded
    ref, got = _step0_loss(solo), _step0_loss(sharded)
    assert abs(got - ref) <= 1e-5 * max(1.0, abs(ref)), (solo, sharded)
