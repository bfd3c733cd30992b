"""Prompt-schema invariants and the jitted AR decode loop (tiny config)."""

import numpy as np
import jax
import jax.numpy as jnp

from qwen_tts_tpu.config import tiny_tts_config
from qwen_tts_tpu.generate import (
    GenerationParams,
    batch_prompts,
    build_prompt,
    generate_codes,
)
from qwen_tts_tpu.models import subtalker as st_mod
from qwen_tts_tpu.models import talker as talker_mod

CFG = tiny_tts_config()


def _params():
    p = talker_mod.init_talker_params(jax.random.PRNGKey(0), CFG.talker)
    st = st_mod.init_subtalker_params(
        jax.random.PRNGKey(1), CFG.talker.code_predictor, CFG.talker.hidden_size
    )
    return p, st


def _text_ids(n_content=6):
    # [im_start, assistant, \n] + content + [im_end, \n, im_start, assistant, \n]
    role = [1, 2, 3]
    content = list(range(10, 10 + n_content))
    tail = [4, 5, 1, 2, 3]
    return np.array(role + content + tail, np.int32)


def test_prompt_schema_structure():
    params, _ = _params()
    tk = CFG.talker
    ids = _text_ids()
    p = build_prompt(params, CFG, ids, language="auto", speaker="aiden")

    # auto language → 3 think tokens; + speaker + pad + bos = 6 codec ids;
    # prefix = 3 role + (6 - 1) + 1 first-text = 9.
    assert p.embeds.shape[0] == 3 + 6
    role = np.asarray(talker_mod.embed_text(params, jnp.asarray(ids[:3])))
    np.testing.assert_allclose(p.embeds[:3], role, atol=1e-6)

    tts_pad = np.asarray(
        talker_mod.embed_text(params, jnp.asarray([CFG.tts_pad_token_id]))
    )[0]
    nothink = np.asarray(
        talker_mod.embed_codec(params, jnp.asarray([tk.codec_nothink_id]))
    )[0]
    np.testing.assert_allclose(p.embeds[3], tts_pad + nothink, atol=1e-6)

    # Speaker slot: position 6 = tts_pad + codec_embedding[spk_id].
    spk = np.asarray(talker_mod.embed_codec(params, jnp.asarray([100])))[0]
    np.testing.assert_allclose(p.embeds[6], tts_pad + spk, atol=1e-6)

    # Last position: first text token + codec_bos.
    first_text = np.asarray(talker_mod.embed_text(params, jnp.asarray(ids[3:4])))[0]
    bos = np.asarray(talker_mod.embed_codec(params, jnp.asarray([tk.codec_bos_id])))[0]
    np.testing.assert_allclose(p.embeds[-1], first_text + bos, atol=1e-6)

    # Trailing = remaining text + tts_eos.
    assert p.trailing_text.shape[0] == len(ids) - 9 + 1
    tts_eos = np.asarray(
        talker_mod.embed_text(params, jnp.asarray([CFG.tts_eos_token_id]))
    )[0]
    np.testing.assert_allclose(p.trailing_text[-1], tts_eos, atol=1e-6)


def test_prompt_language_and_nonstreaming():
    params, _ = _params()
    ids = _text_ids()
    p = build_prompt(params, CFG, ids, language="english")
    # known language → 4 think tokens + pad + bos = 6; no speaker.
    assert p.embeds.shape[0] == 3 + 6

    pn = build_prompt(params, CFG, ids, language="english", non_streaming=True)
    # role 3 + (6-1)=5 + content 6 + eos 1 + bos-slot 1 = 16
    assert pn.embeds.shape[0] == 16
    assert pn.trailing_text.shape[0] == 1  # just tts_pad


def test_generate_codes_shapes_and_determinism():
    params, st = _params()
    ids = _text_ids()
    prompts = [
        build_prompt(params, CFG, _text_ids(4), language="auto", speaker="aiden"),
        build_prompt(params, CFG, _text_ids(7), language="english"),
    ]
    embeds, mask, trailing, lengths = batch_prompts(prompts, bucket=8)
    assert embeds.shape[1] == 16  # bucketized
    assert mask[0].sum() == prompts[0].embeds.shape[0]

    gp = GenerationParams(max_new_tokens=6).greedy()
    out = generate_codes(
        params, st, CFG.talker,
        jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(trailing),
        sampling=gp.talker_sampling(), st_sampling=gp.subtalker_sampling(),
        max_new_tokens=6, rng=jax.random.PRNGKey(0),
    )
    assert out.codes.shape == (2, 6, CFG.talker.num_code_groups)
    assert out.codes.dtype == jnp.int32

    # Greedy decode is deterministic across invocations.
    out2 = generate_codes(
        params, st, CFG.talker,
        jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(trailing),
        sampling=gp.talker_sampling(), st_sampling=gp.subtalker_sampling(),
        max_new_tokens=6, rng=jax.random.PRNGKey(7),
    )
    np.testing.assert_array_equal(np.asarray(out.codes), np.asarray(out2.codes))
    np.testing.assert_array_equal(np.asarray(out.num_gen), np.asarray(out2.num_gen))

    # Random weights shouldn't instantly EOS now that the suppress tail is
    # config-scaled — make the assertions below non-vacuous.
    assert (np.asarray(out.num_gen) > 0).all()

    # Codebook-0 tokens must respect the suppress mask (vocab tail banned).
    v = CFG.talker.vocab_size
    cb0 = np.asarray(out.codes[..., 0])
    n = np.asarray(out.num_gen)
    for b in range(2):
        valid = cb0[b, : n[b]]
        assert (
            (valid < v - CFG.talker.suppress_tail)
            | (valid == CFG.talker.codec_eos_token_id)
        ).all()


def test_generate_batch_matches_single():
    """Left-padded batched decode must equal per-utterance decode (greedy)."""
    params, st = _params()
    p1 = build_prompt(params, CFG, _text_ids(4), language="auto", speaker="aiden")
    p2 = build_prompt(params, CFG, _text_ids(7), language="english")

    gp = GenerationParams(max_new_tokens=5).greedy()
    kw = dict(sampling=gp.talker_sampling(), st_sampling=gp.subtalker_sampling(),
              max_new_tokens=5, rng=jax.random.PRNGKey(0))

    eb, mb, tb, _ = batch_prompts([p1, p2], bucket=4)
    both = generate_codes(params, st, CFG.talker, jnp.asarray(eb),
                          jnp.asarray(mb), jnp.asarray(tb), **kw)

    for i, p in enumerate([p1, p2]):
        e, m, t, _ = batch_prompts([p], bucket=4)
        solo = generate_codes(params, st, CFG.talker, jnp.asarray(e),
                              jnp.asarray(m), jnp.asarray(t), **kw)
        n = int(np.asarray(solo.num_gen)[0])
        assert n == int(np.asarray(both.num_gen)[i])
        np.testing.assert_array_equal(
            np.asarray(solo.codes)[0, :n], np.asarray(both.codes)[i, :n]
        )


def test_dialect_speaker_overrides_language_id():
    """A speaker marked as a dialect forces its dialect's codec language id
    regardless of the requested language (modeling_qwen3_tts.py:2118-2122)."""
    import dataclasses

    tk = dataclasses.replace(
        CFG.talker,
        spk_is_dialect=(("aiden", ""), ("serena", "shanghai_dialect")),
        codec_language_id=(("chinese", 200), ("english", 201),
                           ("shanghai_dialect", 202)),
    )
    cfg = dataclasses.replace(CFG, talker=tk)
    params, _ = _params()
    ids = _text_ids()

    def lang_slot(prompt):
        # language-known prefix: role(3) + [think, think_bos, LANG, think_eos,
        # speaker, pad] + first-text+bos → lang embed at position 5.
        tts_pad = np.asarray(talker_mod.embed_text(
            params, jnp.asarray([cfg.tts_pad_token_id])))[0]
        return prompt.embeds[5] - tts_pad

    # plain speaker honors the requested language
    p_zh = build_prompt(params, cfg, ids, language="chinese", speaker="aiden")
    want_zh = np.asarray(talker_mod.embed_codec(params, jnp.asarray([200])))[0]
    np.testing.assert_allclose(lang_slot(p_zh), want_zh, atol=1e-5)

    # dialect speaker overrides chinese -> shanghai_dialect id
    p_dia = build_prompt(params, cfg, ids, language="chinese", speaker="serena")
    want_dia = np.asarray(talker_mod.embed_codec(params, jnp.asarray([202])))[0]
    np.testing.assert_allclose(lang_slot(p_dia), want_dia, atol=1e-5)
    assert p_dia.embeds.shape == p_zh.embeds.shape

    # ...but NOT english (the reference gates the override on chinese/auto,
    # modeling_qwen3_tts.py:2118-2122)
    p_en = build_prompt(params, cfg, ids, language="english", speaker="serena")
    want_en = np.asarray(talker_mod.embed_codec(params, jnp.asarray([201])))[0]
    np.testing.assert_allclose(lang_slot(p_en), want_en, atol=1e-5)


def test_step_limit_zero_yields_empty_row():
    """A per-row step_limit of 0 must clamp num_gen to 0, not -1 (ADVICE r3:
    callers slice codes[i, :num_gen[i]] and -1 keeps nearly all frames)."""
    params, st = _params()
    prompts = [
        build_prompt(params, CFG, _text_ids(4), language="auto", speaker="aiden"),
        build_prompt(params, CFG, _text_ids(5), language="english"),
    ]
    embeds, mask, trailing, _ = batch_prompts(prompts, bucket=8)
    gp = GenerationParams(max_new_tokens=4).greedy()
    out = generate_codes(
        params, st, CFG.talker,
        jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(trailing),
        sampling=gp.talker_sampling(), st_sampling=gp.subtalker_sampling(),
        max_new_tokens=4, rng=jax.random.PRNGKey(0),
        step_limit=jnp.asarray([0, 4], jnp.int32),
    )
    n = np.asarray(out.num_gen)
    assert n[0] == 0          # empty row, NOT -1
    assert 0 <= n[1] <= 4


def test_segment_report_survives_donation():
    """Double-buffered serving (continuous.py) fetches segment K's
    num_gen/eos AFTER dispatching segment K+1, which DONATES state K —
    deleting (and reusing) its buffers. The with_report output must carry
    bias-encoded copies in buffers that survive that donation with correct
    values (a plain copy can legally be aliased into the donated input)."""
    from qwen_tts_tpu.generate import decode_segment, init_decode

    params, st = _params()
    prompts = [
        build_prompt(params, CFG, _text_ids(4), language="auto", speaker="aiden"),
        build_prompt(params, CFG, _text_ids(6), language="english"),
    ]
    embeds, mask, trailing, _ = batch_prompts(prompts, bucket=16)
    gp = GenerationParams(max_new_tokens=8).greedy()
    state = init_decode(
        params, st, CFG.talker, jnp.asarray(embeds), jnp.asarray(mask),
        sampling=gp.talker_sampling(), st_sampling=gp.subtalker_sampling(),
        max_cache_len=embeds.shape[1] + 8, rng=jax.random.PRNGKey(0),
        first_segment=0, trailing=jnp.asarray(trailing),
    )
    limit = jnp.full((2,), 8, jnp.int32)
    common = dict(sampling=gp.talker_sampling(),
                  st_sampling=gp.subtalker_sampling(), segment=2,
                  step_limit=limit)
    state, _seg1, report1 = decode_segment(
        params, st, CFG.talker, state, jnp.asarray(trailing),
        with_report=True, **common)
    # Oracle BEFORE the donating dispatch (forces its own fresh fetch).
    want_gen = np.asarray(report1[0]) - 1
    want_eos = ~np.asarray(report1[1])
    # Donate state into segment 2 — state-1's buffers are now dead/reused.
    state, _seg2, report2 = decode_segment(
        params, st, CFG.talker, state, jnp.asarray(trailing),
        with_report=True, **common)
    # The deferred fetch of segment 1's report must still read true values.
    got1 = jax.device_get(report1)
    np.testing.assert_array_equal(np.asarray(got1[0]) - 1, want_gen)
    np.testing.assert_array_equal(~np.asarray(got1[1]), want_eos)
    got2_gen = np.asarray(jax.device_get(report2[0])) - 1
    assert (got2_gen >= want_gen).all() and (got2_gen <= 4).all()
