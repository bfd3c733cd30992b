"""Per-op numerics vs independent torch/numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import torch_ref as ref
from qwen_tts_tpu.ops.attention import attention_decode_step, attention_prefill
from qwen_tts_tpu.ops.norms import layer_norm, rms_norm
from qwen_tts_tpu.ops.rope import apply_rope, merge_mrope_sections, rope_cos_sin
from qwen_tts_tpu.ops.sampling import (
    SamplingConfig,
    apply_repetition_penalty,
    apply_suppress_mask,
    build_suppress_mask,
    sample_token,
)

RNG = np.random.default_rng(0)


def test_rms_norm_matches_torch():
    x = RNG.standard_normal((2, 5, 32)).astype(np.float32)
    w = RNG.standard_normal(32).astype(np.float32)
    got = rms_norm(jnp.asarray(x), jnp.asarray(w), 1e-6)
    want = ref.rms_norm(torch.from_numpy(x), torch.from_numpy(w), 1e-6)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def test_layer_norm_matches_torch():
    x = RNG.standard_normal((2, 7, 16)).astype(np.float32)
    w = RNG.standard_normal(16).astype(np.float32)
    b = RNG.standard_normal(16).astype(np.float32)
    got = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 1e-6)
    want = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (16,), torch.from_numpy(w), torch.from_numpy(b), 1e-6
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def test_rope_matches_torch():
    positions = np.arange(6, dtype=np.int32)[None].repeat(2, 0)
    cos, sin = rope_cos_sin(jnp.asarray(positions), 16, 10000.0)
    tcos, tsin = ref.rope_cos_sin(torch.from_numpy(positions), 16, 10000.0)
    np.testing.assert_allclose(np.asarray(cos), tcos.numpy(), atol=1e-4)
    x = RNG.standard_normal((2, 6, 4, 16)).astype(np.float32)
    got = apply_rope(jnp.asarray(x), cos[:, :, None, :], sin[:, :, None, :])
    want = ref.apply_rope(torch.from_numpy(x), tcos[:, :, None, :], tsin[:, :, None, :])
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)


def test_mrope_identical_streams_reduces_to_rope():
    """SURVEY.md §7: for text-only TTS all 3 streams match — the section merge
    must be an identity."""
    positions = jnp.arange(5)[None]
    cos, sin = rope_cos_sin(positions, 16, 10000.0)
    cos3 = jnp.broadcast_to(cos[None], (3,) + cos.shape)
    sin3 = jnp.broadcast_to(sin[None], (3,) + sin.shape)
    mcos, msin = merge_mrope_sections(cos3, sin3, (4, 2, 2))
    np.testing.assert_allclose(np.asarray(mcos), np.asarray(cos), atol=1e-7)
    np.testing.assert_allclose(np.asarray(msin), np.asarray(sin), atol=1e-7)


def test_mrope_distinct_streams_interleave():
    """With distinct streams, section i of the merged table comes from stream
    i % 3 (modeling_qwen3_tts.py:713-720)."""
    head_dim, sections = 16, (4, 2, 2)
    pos3 = jnp.stack([jnp.arange(5), jnp.arange(5) + 7, jnp.arange(5) + 13])[:, None, :]
    cos3, sin3 = rope_cos_sin(pos3, head_dim, 10000.0)
    mcos, _ = merge_mrope_sections(cos3, sin3, sections)
    # Section boundaries within each half: [0:4]→s0, [4:6]→s1, [6:8]→s2,
    # then the second half repeats the pattern.
    np.testing.assert_allclose(np.asarray(mcos[..., 0:4]), np.asarray(cos3[0, ..., 0:4]))
    np.testing.assert_allclose(np.asarray(mcos[..., 4:6]), np.asarray(cos3[1, ..., 4:6]))
    np.testing.assert_allclose(np.asarray(mcos[..., 6:8]), np.asarray(cos3[2, ..., 6:8]))
    np.testing.assert_allclose(np.asarray(mcos[..., 8:12]), np.asarray(cos3[0, ..., 8:12]))


def test_mrope_interleaved_identical_streams_is_identity():
    positions = jnp.arange(5)[None]
    cos, sin = rope_cos_sin(positions, 16, 10000.0)
    cos3 = jnp.broadcast_to(cos[None], (3,) + cos.shape)
    sin3 = jnp.broadcast_to(sin[None], (3,) + sin.shape)
    mcos, msin = merge_mrope_sections(cos3, sin3, (4, 2, 2), interleaved=True)
    np.testing.assert_allclose(np.asarray(mcos), np.asarray(cos), atol=1e-7)
    np.testing.assert_allclose(np.asarray(msin), np.asarray(sin), atol=1e-7)


def test_mrope_interleaved_strided_assignment():
    """Interleaved merge: channel c (< half) comes from stream c % 3 within
    each stream's extent (modeling_qwen3_tts.py:694-703)."""
    head_dim, sections = 16, (4, 2, 2)
    pos3 = jnp.stack([jnp.arange(5), jnp.arange(5) + 7, jnp.arange(5) + 13])[:, None, :]
    cos3, sin3 = rope_cos_sin(pos3, head_dim, 10000.0)
    mcos, _ = merge_mrope_sections(cos3, sin3, sections, interleaved=True)
    half = head_dim // 2
    got = np.asarray(mcos[..., :half])
    src = np.asarray(cos3[..., :half])
    for c in range(half):
        s = c % 3
        if s != 0 and not (c >= s and c < sections[s] * 3):
            s = 0  # outside stream extent → base stream
        np.testing.assert_allclose(got[..., c], src[s, ..., c], atol=1e-7)
    # Second half duplicates the first (cat([merged] * 2)).
    np.testing.assert_allclose(np.asarray(mcos[..., half:]), got, atol=1e-7)


@pytest.mark.parametrize("sliding_window", [None, 3])
def test_attention_prefill_matches_torch(sliding_window):
    b, s, h, kv, hd = 2, 9, 4, 2, 8
    q = RNG.standard_normal((b, s, h, hd)).astype(np.float32)
    k = RNG.standard_normal((b, s, kv, hd)).astype(np.float32)
    v = RNG.standard_normal((b, s, kv, hd)).astype(np.float32)
    pad = np.ones((b, s), bool)
    pad[1, :3] = False  # left padding
    got = attention_prefill(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        pad_mask=jnp.asarray(pad), sliding_window=sliding_window,
    )
    want = ref.gqa_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
        pad_mask=torch.from_numpy(pad), sliding_window=sliding_window,
    )
    # Padded query rows can attend to nothing valid under a window; only
    # compare real rows.
    np.testing.assert_allclose(np.asarray(got[0]), want[0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1, 3:]), want[1, 3:].numpy(), atol=1e-5)


def test_attention_decode_step_matches_prefill_last_row():
    b, s, h, kv, hd = 2, 7, 4, 2, 8
    s_max = 12
    q = RNG.standard_normal((b, s, h, hd)).astype(np.float32)
    k = RNG.standard_normal((b, s, kv, hd)).astype(np.float32)
    v = RNG.standard_normal((b, s, kv, hd)).astype(np.float32)
    full = attention_prefill(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))

    k_cache = np.zeros((b, s_max, kv, hd), np.float32)
    v_cache = np.zeros((b, s_max, kv, hd), np.float32)
    k_cache[:, :s] = k
    v_cache[:, :s] = v
    step = attention_decode_step(
        jnp.asarray(q[:, -1]), jnp.asarray(k_cache), jnp.asarray(v_cache),
        cur_len=jnp.int32(s), valid_from=jnp.zeros((b,), jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(step), np.asarray(full[:, -1]), atol=1e-5)


def test_suppress_mask():
    mask = build_suppress_mask(100, eos_id=97, tail=10)
    logits = jnp.zeros((1, 100))
    out = apply_suppress_mask(logits, mask)
    assert np.asarray(out)[0, 97] == 0.0
    assert (np.asarray(out)[0, 90:97] < -1e8).all()
    assert (np.asarray(out)[0, 98:] < -1e8).all()
    assert (np.asarray(out)[0, :90] == 0.0).all()


def test_repetition_penalty_hf_semantics():
    logits = jnp.asarray([[2.0, -2.0, 1.0]])
    presence = jnp.asarray([[True, True, False]])
    out = np.asarray(apply_repetition_penalty(logits, presence, 2.0))
    np.testing.assert_allclose(out, [[1.0, -4.0, 1.0]])


def test_greedy_sampling_is_argmax():
    logits = jnp.asarray(RNG.standard_normal((3, 50)).astype(np.float32))
    cfg = SamplingConfig(do_sample=False)
    tok = sample_token(logits, cfg, None)
    np.testing.assert_array_equal(np.asarray(tok), np.argmax(np.asarray(logits), -1))


def test_top_k_top_p_restrict_support():
    logits = jnp.asarray([np.linspace(0, 5, 50).astype(np.float32)])
    cfg = SamplingConfig(do_sample=True, temperature=1.0, top_k=5, top_p=1.0)
    toks = [
        int(sample_token(logits, cfg, jax.random.PRNGKey(i))[0]) for i in range(64)
    ]
    assert all(t >= 45 for t in toks)

    cfg_p = SamplingConfig(do_sample=True, temperature=1.0, top_k=0, top_p=0.5)
    big = np.full((1, 50), -10.0, np.float32)
    big[0, 7] = 10.0
    big[0, 9] = 1.0
    toks = [
        int(sample_token(jnp.asarray(big), cfg_p, jax.random.PRNGKey(i))[0])
        for i in range(32)
    ]
    assert all(t == 7 for t in toks)


def test_vec_sampler_support_matches_static_when_both_knobs_set():
    """With top_k AND top_p set, the vectorized sampler must restrict support
    exactly like the static path (HF warper chain: top-p's softmax runs over
    the top-k-filtered logits). Regression for the one-shot vs
    continuous-batching sampling mismatch."""
    import jax

    from qwen_tts_tpu.ops.sampling import SamplingConfig, sample_token
    from qwen_tts_tpu.ops.sampling_vec import VecSampling, sample_token_vec

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32) * 3)
    cfg = SamplingConfig(do_sample=True, temperature=0.7, top_k=8, top_p=0.6)
    vec = VecSampling.broadcast(cfg, 4)

    # Same key → both paths draw through jax.random.categorical over their
    # warped logits; identical support + identical warps ⇒ identical tokens.
    for seed in range(8):
        key = jax.random.PRNGKey(seed)
        a = np.asarray(sample_token(logits, cfg, key))
        b = np.asarray(sample_token_vec(logits, vec, key))
        np.testing.assert_array_equal(a, b)
