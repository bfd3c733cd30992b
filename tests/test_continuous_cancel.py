"""Serving robustness: cancellation, per-request timeout, and poisoned
requests in the continuous engine (VERDICT r2 item 6). A client disconnect
must never hold a slot for its full budget, and a bad request must never
stall the other slots."""

import time
from concurrent.futures import CancelledError

import numpy as np
import jax.numpy as jnp
import pytest

from ckpt_fixture import make_checkpoint
from qwen_tts_tpu.continuous import ContinuousBatchingEngine
from qwen_tts_tpu.generate import GenerationParams, Prompt, build_prompt
from qwen_tts_tpu.pipeline import Qwen3TTSModel


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    d = tmp_path_factory.mktemp("cancel_ckpt")
    make_checkpoint(str(d))
    return Qwen3TTSModel.from_pretrained(
        str(d), talker_dtype=jnp.float32, load_tokenizer=False
    )


def _prompt(model, ids):
    return build_prompt(
        model.talker_params, model.cfg, np.asarray(ids, np.int32),
        language="english", speaker="aiden",
        st_params=model.subtalker_params,
    )


def _greedy(frames):
    return GenerationParams(
        max_new_tokens=frames, min_new_tokens=frames,
        do_sample=False, subtalker_do_sample=False, repetition_penalty=1.0,
    )


def _engine(model, **kw):
    kw.setdefault("num_slots", 3)
    kw.setdefault("segment_frames", 2)
    kw.setdefault("max_new_tokens", 64)
    kw.setdefault("prefill_bucket", 32)
    kw.setdefault("trailing_cap", 32)
    return ContinuousBatchingEngine(model, **kw).start()


def test_cancel_midflight_frees_slot_others_unaffected(model):
    ids_a = [1, 2, 3, 10, 11, 12, 4, 5, 1, 2, 3]
    ids_b = [1, 2, 3, 20, 21, 22, 23, 24, 4, 5, 1, 2, 3]
    pa, pb = _prompt(model, ids_a), _prompt(model, ids_b)
    short = _greedy(7)
    solo_b = model.generate_codes_from_prompts([pb], short)[0][0]

    engine = _engine(model)
    try:
        fut_long = engine.submit_prompt(pa, _greedy(64))
        fut_b = engine.submit_prompt(pb, short)
        time.sleep(0.5)  # both live
        assert engine.cancel(fut_long) is True
        with pytest.raises(CancelledError):
            fut_long.result(timeout=300)
        # The co-resident request is token-exact vs solo.
        wav_b = fut_b.result(timeout=300)
        np.testing.assert_allclose(
            wav_b, model.decode_codes([solo_b])[0], atol=1e-5)
        # The cancelled slot is reusable.
        fut_c = engine.submit_prompt(pb, short)
        assert fut_c.result(timeout=300).shape[0] > 0
        # Unknown/finished futures are a no-op.
        assert engine.cancel(fut_b) is False
    finally:
        engine.stop()


def test_cancel_while_queued(model):
    p = _prompt(model, [1, 2, 3, 10, 11, 4, 5, 1, 2, 3])
    engine = _engine(model, num_slots=1)
    try:
        # Fill the only slot, queue a second request, cancel it in-queue.
        fut1 = engine.submit_prompt(p, _greedy(20))
        fut2 = engine.submit_prompt(p, _greedy(20))
        assert engine.cancel(fut2) is True
        with pytest.raises(CancelledError):
            fut2.result(timeout=300)
        assert fut1.result(timeout=300).shape[0] > 0
    finally:
        engine.stop()


def test_timeout_resolves_future_and_frees_slot(model):
    p = _prompt(model, [1, 2, 3, 10, 11, 4, 5, 1, 2, 3])
    engine = _engine(model)
    try:
        fut = engine.submit_prompt(p, _greedy(64), timeout_s=0.01)
        with pytest.raises(TimeoutError):
            fut.result(timeout=300)
        # Engine still serves afterwards.
        ok = engine.submit_prompt(p, _greedy(5))
        assert ok.result(timeout=300).shape[0] > 0
    finally:
        engine.stop()


def test_poisoned_request_does_not_stall_others(model):
    good = _prompt(model, [1, 2, 3, 10, 11, 4, 5, 1, 2, 3])
    # Poisoned: embeds with a wrong feature dim blow up inside _admit's
    # prefill — the future must carry the exception, other slots unharmed.
    bad = Prompt(
        embeds=np.zeros((4, 7), np.float32),
        trailing_text=np.zeros((1, 7), np.float32),
        tts_pad_embed=np.zeros((7,), np.float32),
    )
    engine = _engine(model)
    try:
        fut_good1 = engine.submit_prompt(good, _greedy(6))
        fut_bad = engine.submit_prompt(bad, _greedy(6))
        fut_good2 = engine.submit_prompt(good, _greedy(6))
        with pytest.raises(Exception):
            fut_bad.result(timeout=300)
        assert fut_good1.result(timeout=300).shape[0] > 0
        assert fut_good2.result(timeout=300).shape[0] > 0
    finally:
        engine.stop()


def test_streamed_cancel_sends_final_callback(model):
    p = _prompt(model, [1, 2, 3, 10, 11, 4, 5, 1, 2, 3])
    # Budget large enough that the decode cannot FINISH before the cancel
    # lands (a fixed sleep raced warm-cache runs on a fast box); cancel as
    # soon as the first streamed chunk proves the request is mid-flight.
    engine = _engine(model, max_new_tokens=256)
    events = []
    try:
        fut = engine.submit_prompt(
            p, _greedy(256),
            stream_callback=lambda wav, done: events.append((wav.size, done)),
        )
        deadline = time.time() + 120
        while not events and time.time() < deadline:
            time.sleep(0.01)
        assert events, "no streamed chunk arrived"
        assert engine.cancel(fut)
        with pytest.raises(CancelledError):
            fut.result(timeout=300)
    finally:
        engine.stop()
    assert events and events[-1][1] is True  # stream terminated cleanly


def test_window_engine_cancel_queued(model):
    """ServingEngine (window batching): queued requests cancel cleanly; a
    request already inside a compiled window cannot be interrupted (the
    documented contract — use the continuous engine for that)."""
    from qwen_tts_tpu.serving import ServingEngine

    p = _prompt(model, [1, 2, 3, 10, 11, 4, 5, 1, 2, 3])
    engine = ServingEngine(model, max_batch=1, max_wait_ms=5,
                           max_new_tokens=16).start()
    try:
        fut1 = engine.submit_ids(
            np.asarray([1, 2, 3, 10, 11, 4, 5, 1, 2, 3], np.int32),
            speaker="aiden", language="english",
            max_new_tokens=16, do_sample=False, subtalker_dosample=False,
        )
        fut2 = engine.submit_ids(
            np.asarray([1, 2, 3, 20, 21, 4, 5, 1, 2, 3], np.int32),
            speaker="aiden", language="english",
            max_new_tokens=16, do_sample=False, subtalker_dosample=False,
        )
        assert engine.cancel(fut2) is True
        with pytest.raises(CancelledError):
            fut2.result(timeout=300)
        assert fut1.result(timeout=300).shape[0] > 0
        assert engine.cancel(fut1) is False  # already finished
    finally:
        engine.stop()


def test_window_engine_cancel_held_incompatible_request(model):
    """A request HELD for the next window (incompatible sampling controls
    with the current window) must still cancel cleanly from the held queue,
    and the compatible survivor must be unaffected."""
    from qwen_tts_tpu.serving import ServingEngine

    engine = ServingEngine(model, max_batch=2, max_wait_ms=300,
                           max_new_tokens=16).start()
    try:
        ids = np.asarray([1, 2, 3, 10, 11, 4, 5, 1, 2, 3], np.int32)
        fut_greedy = engine.submit_ids(
            ids, speaker="aiden", language="english",
            max_new_tokens=8, do_sample=False, subtalker_dosample=False,
        )
        # Different SAMPLING controls -> held for a later window.
        fut_sampled = engine.submit_ids(
            ids, speaker="aiden", language="english",
            max_new_tokens=8, do_sample=True, temperature=1.3,
        )
        fut_greedy2 = engine.submit_ids(
            ids, speaker="aiden", language="english",
            max_new_tokens=6, do_sample=False, subtalker_dosample=False,
        )
        assert engine.cancel(fut_sampled) is True
        with pytest.raises(CancelledError):
            fut_sampled.result(timeout=300)
        assert fut_greedy.result(timeout=300).shape[0] > 0
        assert fut_greedy2.result(timeout=300).shape[0] > 0
    finally:
        engine.stop()
