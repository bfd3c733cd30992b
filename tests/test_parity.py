"""Greedy parity gate: fast jitted decode == cache-free eager decode,
token-exact (the framework's EOS-parity regression, SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ckpt_fixture import make_checkpoint
from qwen_tts_tpu.generate import build_prompt
from qwen_tts_tpu.pipeline import Qwen3TTSModel
from qwen_tts_tpu.validation import check_parity


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    d = tmp_path_factory.mktemp("parity_ckpt")
    make_checkpoint(str(d))
    return Qwen3TTSModel.from_pretrained(
        str(d), talker_dtype=jnp.float32, load_tokenizer=False
    )


@pytest.mark.parametrize("speaker,language", [("aiden", "english"), (None, "auto")])
def test_greedy_parity(model, speaker, language):
    ids = np.array([1, 2, 3, 10, 11, 12, 13, 14, 4, 5, 1, 2, 3], np.int32)
    prompt = build_prompt(
        model.talker_params, model.cfg, ids, language=language, speaker=speaker,
        st_params=model.subtalker_params,
    )
    result = check_parity(
        model.talker_params, model.subtalker_params, model.cfg, prompt, 12
    )
    assert result.ok, result.report()
