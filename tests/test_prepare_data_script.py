"""scripts/prepare_data.py end-to-end as a subprocess (the reference's
finetuning/prepare_data.py workflow): WAVs + JSONL in → rows gain
"audio_codes" (12 Hz encode) and "speaker_embedding" (ECAPA from
ref_audio)."""

import json
import subprocess
import sys

import numpy as np
import pytest

from ckpt_fixture import make_checkpoint
from qwen_tts_tpu.io.wav import write_wav


def test_prepare_data_encodes_rows(tmp_path):
    d = str(tmp_path / "ckpt")
    cfg = make_checkpoint(d, with_encoders=True)

    rng = np.random.default_rng(0)
    rows = []
    for i, n in enumerate((4800, 7200)):
        wav_path = str(tmp_path / f"a{i}.wav")
        write_wav(wav_path,
                  (0.1 * rng.standard_normal(n)).astype(np.float32), 24000)
        rows.append({"audio": wav_path, "text": f"utterance {i}",
                     "ref_audio": wav_path})
    src = str(tmp_path / "in.jsonl")
    with open(src, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    out_path = str(tmp_path / "out.jsonl")
    out = subprocess.run(
        [sys.executable, "scripts/prepare_data.py", "--cpu",
         "--model-path", d, "--input", src, "--output", out_path,
         "--batch-size", "2"],
        capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-2000:]

    got = [json.loads(l) for l in open(out_path) if l.strip()]
    assert len(got) == 2
    down = cfg.codec.encode_downsample_rate
    for i, (row, n) in enumerate(zip(got, (4800, 7200))):
        codes = np.asarray(row["audio_codes"])
        assert codes.ndim == 2
        assert codes.shape[0] == -(-n // down)
        assert codes.shape[1] == cfg.talker.num_code_groups
        assert (codes >= 0).all()
        spk = np.asarray(row["speaker_embedding"], np.float32)
        assert spk.shape == (cfg.speaker_encoder.enc_dim,)
        assert np.isfinite(spk).all()
        assert row["text"] == f"utterance {i}"
