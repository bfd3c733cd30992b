"""Mixed-load soak of the continuous engine: more requests than slots,
heterogeneous kinds (custom voice / ICL clone / x-vector-only clone),
greedy and sampled rows sharing the slot pool — greedy rows must stay
byte-equal to their solo pipeline outputs (slot isolation), everything
must complete."""

import numpy as np
import jax.numpy as jnp
import pytest

from ckpt_fixture import make_checkpoint
from qwen_tts_tpu.continuous import ContinuousBatchingEngine
from qwen_tts_tpu.pipeline import Qwen3TTSModel
from test_voice_clone import FakeTokenizer

GREEDY = dict(do_sample=False, subtalker_dosample=False)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    d = tmp_path_factory.mktemp("soak_ckpt")
    make_checkpoint(str(d), with_encoders=True)
    m = Qwen3TTSModel.from_pretrained(
        str(d), talker_dtype=jnp.float32, load_tokenizer=False
    )
    m.tokenizer = FakeTokenizer()
    return m


def test_mixed_load_soak(model):
    ref = (0.1 * np.sin(np.linspace(0, 150, 4800))).astype(np.float32)
    icl = model.create_voice_clone_prompt(ref, ref_text="ref")
    xv_only = model.create_voice_clone_prompt(ref, x_vector_only_mode=True)

    # Solo pipeline outputs for the greedy rows (the parity oracles).
    want_cv, _ = model.generate_custom_voice(
        "alpha", "aiden", "english", max_new_tokens=4, **GREEDY
    )
    want_icl, _ = model.generate_voice_clone(
        "beta", icl, language="english", max_new_tokens=5, **GREEDY
    )
    want_xv, _ = model.generate_voice_clone(
        "gamma", xv_only, language="auto", max_new_tokens=3, **GREEDY
    )

    engine = ContinuousBatchingEngine(
        model, num_slots=3, segment_frames=2, max_new_tokens=6,
        prefill_bucket=128,
    ).start()

    def ids(text):
        return model._tokenize(model.build_assistant_text(text))

    def clone_kw(prompt):
        se, ri, rc = model.clone_prompt_inputs(prompt)
        return dict(speaker_embed=se, ref_ids=ri, ref_codes=rc)

    try:
        futs = {}
        # Greedy parity rows.
        futs["cv"] = engine.submit_ids(
            ids("alpha"), speaker="aiden", language="english",
            max_new_tokens=4, **GREEDY,
        )
        futs["icl"] = engine.submit_ids(
            ids("beta"), language="english", **clone_kw(icl),
            max_new_tokens=5, **GREEDY,
        )
        futs["xv"] = engine.submit_ids(
            ids("gamma"), language="auto", **clone_kw(xv_only),
            max_new_tokens=3, **GREEDY,
        )
        # Load: sampled rows with varied knobs, exceeding the slot pool.
        for i in range(7):
            futs[f"s{i}"] = engine.submit_ids(
                ids(f"noise {i}"), speaker="serena", language="auto",
                max_new_tokens=2 + (i % 5),
                do_sample=True, temperature=0.7 + 0.1 * i,
                top_k=2 + i, seed=100 + i,
            )

        up = model.cfg.codec.decode_upsample_rate
        results = {k: f.result(timeout=600) for k, f in futs.items()}
        for k, wav in results.items():
            assert wav.ndim == 1 and np.isfinite(wav).all(), k
            assert wav.shape[0] % up == 0, k
        # Greedy rows are byte-equal to solo despite sampled neighbors.
        np.testing.assert_array_equal(want_cv[0], results["cv"])
        np.testing.assert_array_equal(want_icl[0], results["icl"])
        np.testing.assert_array_equal(want_xv[0], results["xv"])
        for i in range(7):
            assert results[f"s{i}"].shape[0] // up <= 2 + (i % 5)
        assert engine.stats["requests"] == 10
    finally:
        engine.stop()


def test_chaos_soak_with_cancels_and_poison(model):
    """Soak with failure injection: cancels mid-flight, per-request
    timeouts, and a poisoned request interleaved with greedy parity rows —
    surviving rows stay byte-equal to solo, nothing stalls."""
    from concurrent.futures import CancelledError

    from qwen_tts_tpu.generate import GenerationParams, Prompt

    want_cv, _ = model.generate_custom_voice(
        "alpha", "aiden", "english", max_new_tokens=4, **GREEDY
    )

    def ids(text):
        return model._tokenize(model.build_assistant_text(text))

    engine = ContinuousBatchingEngine(
        model, num_slots=3, segment_frames=2, max_new_tokens=32,
        prefill_bucket=128,
    ).start()
    try:
        parity = engine.submit_ids(
            ids("alpha"), speaker="aiden", language="english",
            max_new_tokens=4, **GREEDY,
        )
        doomed = [
            engine.submit_ids(ids(f"doomed {i}"), speaker="serena",
                              language="auto", max_new_tokens=32,
                              do_sample=True, seed=i)
            for i in range(3)
        ]
        timed = engine.submit_ids(
            ids("timed"), speaker="serena", language="auto",
            max_new_tokens=32, do_sample=True, timeout_s=0.01,
        )
        bad = engine.submit_prompt(
            Prompt(np.zeros((4, 9), np.float32),
                   np.zeros((1, 9), np.float32),
                   np.zeros((9,), np.float32)),
            GenerationParams(max_new_tokens=4),
        )
        import time as _t
        _t.sleep(0.4)
        for f in doomed:
            engine.cancel(f)
        survivors = [
            engine.submit_ids(ids(f"late {i}"), speaker="serena",
                              language="auto", max_new_tokens=3,
                              do_sample=True, seed=50 + i)
            for i in range(3)
        ]

        np.testing.assert_array_equal(want_cv[0],
                                      parity.result(timeout=600))
        for f in doomed:
            with pytest.raises(CancelledError):
                f.result(timeout=600)
        with pytest.raises(TimeoutError):
            timed.result(timeout=600)
        with pytest.raises(Exception):
            bad.result(timeout=600)
        up = model.cfg.codec.decode_upsample_rate
        for f in survivors:
            wav = f.result(timeout=600)
            assert wav.shape[0] % up == 0 and np.isfinite(wav).all()
    finally:
        engine.stop()
