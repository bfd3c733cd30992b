"""Multi-bucket prefill in the continuous engine: short prompts pad to the
small bucket, long ICL clone prompts to the large one — same slot pool, one
decode program, greedy outputs byte-equal to solo."""

import numpy as np
import jax.numpy as jnp
import pytest

from ckpt_fixture import make_checkpoint
from qwen_tts_tpu.continuous import ContinuousBatchingEngine
from qwen_tts_tpu.pipeline import Qwen3TTSModel
from test_voice_clone import FakeTokenizer

GREEDY = dict(max_new_tokens=4, do_sample=False, subtalker_dosample=False)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    d = tmp_path_factory.mktemp("mb_ckpt")
    make_checkpoint(str(d), with_encoders=True)
    m = Qwen3TTSModel.from_pretrained(
        str(d), talker_dtype=jnp.float32, load_tokenizer=False
    )
    m.tokenizer = FakeTokenizer()
    return m


def test_mixed_buckets_greedy_parity(model):
    ref = (0.1 * np.sin(np.linspace(0, 150, 4800))).astype(np.float32)
    icl = model.create_voice_clone_prompt(ref, ref_text="ref")
    se, ri, rc = model.clone_prompt_inputs(icl)

    want_short, _ = model.generate_custom_voice(
        "alpha", "aiden", "english", **GREEDY
    )
    want_icl, _ = model.generate_voice_clone(
        "beta", icl, language="english", **GREEDY
    )

    engine = ContinuousBatchingEngine(
        model, num_slots=2, segment_frames=2, max_new_tokens=4,
        prefill_bucket=(16, 128),
    ).start()
    try:
        assert engine.prefill_buckets == (16, 128)
        assert engine.prefill_bucket == 128  # pool sized by the largest

        def ids(text):
            return model._tokenize(model.build_assistant_text(text))

        f_short = engine.submit_ids(ids("alpha"), speaker="aiden",
                                    language="english", **GREEDY)
        f_icl = engine.submit_ids(ids("beta"), language="english",
                                  speaker_embed=se, ref_ids=ri, ref_codes=rc,
                                  **GREEDY)
        np.testing.assert_array_equal(want_short[0],
                                      f_short.result(timeout=300))
        np.testing.assert_array_equal(want_icl[0], f_icl.result(timeout=300))
        # The short prompt (≤16 tokens) took the small bucket, the ICL
        # prompt (>16) the large one.
        assert engine.stats["bucket_admits"][16] == 1
        assert engine.stats["bucket_admits"][128] == 1

        # Prompts beyond the largest bucket are rejected up front. Text
        # rides the trailing track, so only an ICL prefix can overflow —
        # use oversized ref codes.
        big_rc = np.tile(rc, (60, 1))[:150]
        with pytest.raises(ValueError, match="prefill bucket"):
            engine.submit_ids(ids("beta"), language="english",
                              speaker_embed=se, ref_ids=ri,
                              ref_codes=big_rc, **GREEDY)
    finally:
        engine.stop()
