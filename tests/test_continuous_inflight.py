"""Double-buffered dispatch edge semantics (VERDICT r4 item 3).

Under double-buffering (continuous.py::_run_loop) segment K's results are
fetched only after segment K+1 is dispatched, so between dispatch and
processing a slot can be freed, re-admitted, cancelled, or the engine shut
down. These tests provoke each race deterministically and pin the exact
contracts: the identity-keyed participant snapshot drops a previous
occupant's frames, aborts resolve while a segment is in flight, and the
shutdown drain never leaves a future unresolved.
"""

import time
from concurrent.futures import CancelledError

import numpy as np
import jax.numpy as jnp
import pytest

from ckpt_fixture import make_checkpoint
from qwen_tts_tpu.continuous import ContinuousBatchingEngine
from qwen_tts_tpu.generate import GenerationParams, build_prompt
from qwen_tts_tpu.pipeline import Qwen3TTSModel


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    d = tmp_path_factory.mktemp("inflight_ckpt")
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
        max_new_tokens=frames + 1, min_new_tokens=frames + 1,
        do_sample=False, subtalker_do_sample=False, repetition_penalty=1.0,
    )


def test_slot_readmitted_while_segment_inflight(model):
    """One slot, two queued requests: A's EOS is discovered while its
    eos-frozen follow-up segment is still in flight, so B is admitted into
    the SAME slot before that segment is processed. The identity-keyed
    snapshot must drop A's stale frames — without it they would be appended
    to B's stream and corrupt its host frame counter, breaking byte
    equality with the one-shot decode."""
    ids_a = [1, 2, 3, 10, 11, 12, 4, 5]
    ids_b = [1, 2, 3, 20, 21, 22, 23, 24, 4, 5]
    pa, pb = _prompt(model, ids_a), _prompt(model, ids_b)
    params_a, params_b = _greedy(4), _greedy(6)

    solo = {}
    for name, p, prm in (("a", pa, params_a), ("b", pb, params_b)):
        codes, _ = model.generate_codes_from_prompts([p], prm)
        solo[name] = codes[0]

    engine = ContinuousBatchingEngine(
        model, num_slots=1, segment_frames=2, max_new_tokens=16,
        prefill_bucket=32, trailing_cap=32,
    ).start()
    try:
        fut_a = engine.submit_prompt(pa, params_a)
        fut_b = engine.submit_prompt(pb, params_b)
        wav_a = fut_a.result(timeout=300)
        wav_b = fut_b.result(timeout=300)
    finally:
        engine.stop()

    np.testing.assert_allclose(wav_a, model.decode_codes([solo["a"]])[0],
                               atol=1e-5)
    np.testing.assert_allclose(wav_b, model.decode_codes([solo["b"]])[0],
                               atol=1e-5)
    # The race must actually have occurred: A rode at least one eos-frozen
    # segment whose results arrived after the slot changed hands/emptied.
    assert engine.stats["stale_skips"] >= 1


def test_cancel_races_inflight_segment(model):
    """Cancel a mid-decode request: its abort lands between a segment's
    dispatch and its processing (reap runs before the in-flight fetch), so
    the freed slot's in-flight frames must be dropped while the OTHER
    slot's output stays byte-equal to the one-shot decode."""
    ids_a = [1, 2, 3, 10, 11, 12, 4, 5]
    ids_c = [1, 2, 3, 20, 21, 22, 23, 24, 4, 5]
    pa, pc = _prompt(model, ids_a), _prompt(model, ids_c)
    params_c = _greedy(8)

    codes_c, _ = model.generate_codes_from_prompts([pc], params_c)
    want_c = model.decode_codes([codes_c[0]])[0]

    started = []
    engine = ContinuousBatchingEngine(
        model, num_slots=2, segment_frames=2, max_new_tokens=64,
        prefill_bucket=32, trailing_cap=32,
    ).start()
    try:
        fut_a = engine.submit_prompt(
            pa, _greedy(60),
            stream_callback=lambda wav, done: started.append(len(wav)))
        fut_c = engine.submit_prompt(pc, params_c)
        # Wait until A is demonstrably mid-decode, then cancel it.
        deadline = time.time() + 120
        while not started and time.time() < deadline:
            time.sleep(0.01)
        assert started, "A never started streaming"
        assert engine.cancel(fut_a)
        wav_c = fut_c.result(timeout=300)
        with pytest.raises(CancelledError):
            fut_a.result(timeout=300)
    finally:
        engine.stop()

    np.testing.assert_allclose(wav_c, want_c, atol=1e-5)
    assert engine.stats["stale_skips"] >= 1


def test_shutdown_drain_resolves_every_future(model):
    """stop() while requests are queued and decoding: no future may be left
    unresolved. Finished work that was in flight resolves normally through
    the drain's final fetch; everything else gets CancelledError. Without
    the _run finally-drain, stop() racing an active decode exits the loop
    with _inflight pending and clients block forever."""
    ids = [1, 2, 3, 10, 11, 12, 4, 5]
    p = _prompt(model, ids)

    engine = ContinuousBatchingEngine(
        model, num_slots=1, segment_frames=2, max_new_tokens=256,
        prefill_bucket=32, trailing_cap=32,
    ).start()
    futs = [engine.submit_prompt(p, _greedy(200)) for _ in range(3)]
    # Let the first request get admitted and mid-decode, then stop.
    deadline = time.time() + 120
    while engine.stats["segments"] == 0 and time.time() < deadline:
        time.sleep(0.01)
    assert engine.stats["segments"] > 0
    engine.stop()

    for fut in futs:
        # Must resolve promptly — result or exception, never a hang.
        try:
            fut.result(timeout=10)
        except CancelledError:
            pass


def test_streaming_order_under_one_segment_lag(model):
    """Per-request streaming under double-buffering: chunks arrive in
    order, exactly one done=True and it is final, and the concatenation is
    byte-equal to the one-shot decode of the solo greedy codes."""
    ids = [1, 2, 3, 20, 21, 22, 23, 24, 4, 5]
    p = _prompt(model, ids)
    params = _greedy(8)

    codes, _ = model.generate_codes_from_prompts([p], params)
    want = model.decode_codes([codes[0]])[0]

    events = []
    engine = ContinuousBatchingEngine(
        model, num_slots=2, segment_frames=2, max_new_tokens=16,
        prefill_bucket=32, trailing_cap=32,
    ).start()
    try:
        fut = engine.submit_prompt(
            p, params,
            stream_callback=lambda wav, done: events.append(
                (np.asarray(wav, np.float32).copy(), bool(done))))
        wav = fut.result(timeout=300)
    finally:
        engine.stop()

    assert events, "no streaming callbacks"
    dones = [d for _, d in events]
    assert dones.count(True) == 1 and dones[-1], \
        "done=True must be emitted exactly once, last"
    # Chunks re-decode under a bounded left context (stream_context_frames),
    # so the streamed concatenation matches within the documented 1e-4 band
    # (same contract as test_streaming_slot_matches_batch_result); the
    # future's one-shot wav is exact.
    streamed = np.concatenate([w for w, _ in events])
    assert streamed.shape == want.shape
    np.testing.assert_allclose(streamed, want, atol=1e-4)
    # Streaming requests resolve their future with an empty array — the
    # audio was already delivered through the callbacks (_finish_one).
    assert wav.shape == (0,)


def test_sync_dispatch_mode_matches_solo(model):
    """sync_dispatch=True (the operator A/B switch back to the pre-r4
    synchronous loop — no in-flight segment ever) must stay byte-equal to
    the one-shot decode, with no stale-skip events (nothing is ever
    processed late)."""
    ids = [1, 2, 3, 20, 21, 22, 23, 24, 4, 5]
    p = _prompt(model, ids)
    params = _greedy(6)
    codes, _ = model.generate_codes_from_prompts([p], params)
    want = model.decode_codes([codes[0]])[0]

    engine = ContinuousBatchingEngine(
        model, num_slots=2, segment_frames=2, max_new_tokens=16,
        prefill_bucket=32, trailing_cap=32, sync_dispatch=True,
    ).start()
    try:
        wav = engine.submit_prompt(p, params).result(timeout=300)
    finally:
        engine.stop()
    np.testing.assert_allclose(wav, want, atol=1e-5)
    assert engine.stats["stale_skips"] == 0
