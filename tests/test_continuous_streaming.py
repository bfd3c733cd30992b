"""Streaming emission from continuous-batching slots: chunks arrive as frames
decode and concatenate to the non-streamed result."""

import time

import numpy as np
import jax.numpy as jnp
import pytest

from ckpt_fixture import make_checkpoint
from qwen_tts_tpu.continuous import ContinuousBatchingEngine
from qwen_tts_tpu.generate import GenerationParams, build_prompt
from qwen_tts_tpu.pipeline import Qwen3TTSModel


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    d = tmp_path_factory.mktemp("cstream_ckpt")
    make_checkpoint(str(d))
    return Qwen3TTSModel.from_pretrained(
        str(d), talker_dtype=jnp.float32, load_tokenizer=False
    )


def test_streaming_slot_matches_batch_result(model):
    ids = [1, 2, 3, 10, 11, 12, 4, 5, 1, 2, 3]
    prompt = build_prompt(
        model.talker_params, model.cfg, np.asarray(ids, np.int32),
        language="english", speaker="aiden",
        st_params=model.subtalker_params,
    )
    params = GenerationParams(
        max_new_tokens=6, min_new_tokens=6,
        do_sample=False, subtalker_do_sample=False, repetition_penalty=1.0,
    )
    solo_codes, _ = model.generate_codes_from_prompts([prompt], params)
    want = model.decode_codes(solo_codes)[0]

    engine = ContinuousBatchingEngine(
        model, num_slots=2, segment_frames=2, max_new_tokens=16,
        prefill_bucket=32, trailing_cap=32,
    ).start()
    chunks = []
    done_flags = []
    try:
        fut = engine.submit_prompt(
            prompt, params,
            stream_callback=lambda wav, done: (chunks.append(wav),
                                               done_flags.append(done)),
        )
        fut.result(timeout=300)
    finally:
        engine.stop()

    assert done_flags[-1] is True
    assert len(chunks) >= 3  # 6 frames / 2-frame segments
    got = np.concatenate(chunks)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)
