"""Model-level numerics: trunk prefill/decode consistency, talker forward vs
torch oracle, sub-talker schedule, codec pipeline vs torch oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

import torch_ref as ref
from qwen_tts_tpu.config import tiny_tts_config
from qwen_tts_tpu.models import codec as codec_mod
from qwen_tts_tpu.models import subtalker as st_mod
from qwen_tts_tpu.models import talker as talker_mod
from qwen_tts_tpu.models.trunk import (
    TrunkDims,
    init_trunk_params,
    trunk_decode_step,
    trunk_prefill,
)
from qwen_tts_tpu.ops.rope import rope_cos_sin
from qwen_tts_tpu.ops.sampling import SamplingConfig

CFG = tiny_tts_config()


def _np(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def test_trunk_prefill_matches_torch_oracle():
    dims = TrunkDims(num_layers=2, hidden=32, heads=4, kv_heads=2, head_dim=8,
                     intermediate=64, eps=1e-6)
    params = init_trunk_params(jax.random.PRNGKey(0), dims)
    x = np.random.default_rng(0).standard_normal((2, 6, 32)).astype(np.float32)
    positions = jnp.broadcast_to(jnp.arange(6)[None], (2, 6))
    cos, sin = rope_cos_sin(positions, 8, 10000.0)

    got, ks, vs = trunk_prefill(params, dims, jnp.asarray(x), cos, sin)
    assert ks.shape == (2, 2, 6, 2, 8)

    tcos, tsin = ref.rope_cos_sin(torch.arange(6)[None].expand(2, -1), 8, 10000.0)
    want = ref.trunk_forward(_np(params), torch.from_numpy(x), tcos, tsin, 1e-6, 8)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4)


def test_trunk_decode_step_matches_prefill():
    """The single-token cached path must reproduce the full-sequence forward —
    the core prefill/decode consistency invariant."""
    dims = TrunkDims(num_layers=2, hidden=32, heads=4, kv_heads=2, head_dim=8,
                     intermediate=64, eps=1e-6)
    params = init_trunk_params(jax.random.PRNGKey(1), dims)
    b, s, s_max = 2, 5, 9
    x = np.random.default_rng(1).standard_normal((b, s, 32)).astype(np.float32)
    positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    cos, sin = rope_cos_sin(positions, 8, 10000.0)
    full_out, _, _ = trunk_prefill(params, dims, jnp.asarray(x), cos, sin)

    k_cache = jnp.zeros((2, b, s_max, 2, 8))
    v_cache = jnp.zeros((2, b, s_max, 2, 8))
    out = None
    for t in range(s):
        c, sn = rope_cos_sin(jnp.full((b,), t), 8, 10000.0)
        out, k_cache, v_cache = trunk_decode_step(
            params, dims, jnp.asarray(x[:, t]), c, sn, k_cache, v_cache,
            jnp.int32(t + 1), valid_from=jnp.zeros((b,), jnp.int32),
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(full_out[:, -1]), atol=2e-4)


def test_talker_prefill_then_decode_matches_full_forward():
    """Left-padded prefill + cached decode == unpadded full forward on the
    concatenated sequence (positions follow the reference's mask-cumsum rope
    indexing, modeling_qwen3_tts.py:1794-1800)."""
    cfg = CFG.talker
    params = talker_mod.init_talker_params(jax.random.PRNGKey(2), cfg)
    b, s, extra = 2, 6, 3
    rng = np.random.default_rng(2)
    embeds = rng.standard_normal((b, s + extra, cfg.hidden_size)).astype(np.float32)

    # Full forward, no padding: use prefill on the whole sequence.
    kc, vc = talker_mod.alloc_kv_cache(cfg, b, s + extra)
    full = talker_mod.talker_prefill(
        params, cfg, jnp.asarray(embeds),
        jnp.ones((b, s + extra), bool), kc, vc,
    )

    # Left-padded prefill of the first s tokens (both rows padded by 2), then
    # decode the remaining tokens one at a time against the padded cache.
    n_pad = 2
    padded = np.zeros((b, s + n_pad, cfg.hidden_size), np.float32)
    mask = np.zeros((b, s + n_pad), bool)
    padded[:, n_pad:] = embeds[:, :s]
    mask[:, n_pad:] = True

    kc, vc = talker_mod.alloc_kv_cache(cfg, b, s + n_pad + extra)
    out = talker_mod.talker_prefill(
        params, cfg, jnp.asarray(padded), jnp.asarray(mask), kc, vc
    )
    unpadded = talker_mod.talker_prefill(
        params, cfg, jnp.asarray(embeds[:, :s]), jnp.ones((b, s), bool),
        *talker_mod.alloc_kv_cache(cfg, b, s),
    )
    np.testing.assert_allclose(
        np.asarray(out.last_hidden), np.asarray(unpadded.last_hidden), atol=2e-4
    )

    kc2, vc2 = out.k_cache, out.v_cache
    hidden = None
    for t in range(extra):
        logits, hidden, kc2, vc2 = talker_mod.talker_decode_step(
            params, cfg, jnp.asarray(embeds[:, s + t]),
            jnp.full((b,), s + t), kc2, vc2,
            jnp.int32(s + n_pad + t + 1), jnp.full((b,), n_pad, jnp.int32),
        )
    np.testing.assert_allclose(
        np.asarray(hidden), np.asarray(full.last_hidden), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full.logits), atol=5e-3
    )


def test_subtalker_schedule_matches_manual_loop():
    """Greedy micro-decode equals a hand-rolled per-position loop implementing
    the reference schedule (modeling_qwen3_tts.py:1276-1312)."""
    cfg = CFG.talker.code_predictor
    tcfg = CFG.talker
    params = st_mod.init_subtalker_params(
        jax.random.PRNGKey(3), cfg, tcfg.hidden_size
    )
    talker_emb = jax.random.normal(
        jax.random.PRNGKey(4), (tcfg.vocab_size, tcfg.hidden_size)
    )
    b = 2
    prev_hidden = jax.random.normal(jax.random.PRNGKey(5), (b, tcfg.hidden_size))
    first_code = jnp.asarray([3, 7], jnp.int32)

    codes = st_mod.subtalker_generate(
        params, cfg, talker_emb, prev_hidden, first_code,
        SamplingConfig(do_sample=False), None,
    )
    assert codes.shape == (b, cfg.num_code_groups)
    np.testing.assert_array_equal(np.asarray(codes[:, 0]), np.asarray(first_code))

    # Manual loop using trunk_decode_step directly.
    dims = st_mod.subtalker_dims(cfg)
    kc, vc = st_mod.alloc_subtalker_cache(cfg, b)
    want = [np.asarray(first_code)]
    prev = first_code
    for pos in range(cfg.num_code_groups):
        if pos == 0:
            x = prev_hidden
        elif pos == 1:
            x = talker_emb[prev]
        else:
            x = params["embeds"][pos - 2][prev]
        cos, sin = rope_cos_sin(jnp.full((b,), pos), cfg.head_dim, cfg.rope_theta)
        h, kc, vc = trunk_decode_step(params["trunk"], dims, x, cos, sin,
                                      kc, vc, jnp.int32(pos + 1))
        from qwen_tts_tpu.ops.norms import rms_norm
        h = rms_norm(h, params["norm"], cfg.rms_norm_eps)
        if pos >= 1:
            logits = h @ params["lm_heads"][pos - 1]
            prev = jnp.argmax(logits, -1).astype(jnp.int32)
            want.append(np.asarray(prev))
    np.testing.assert_array_equal(np.asarray(codes), np.stack(want, 1))


def test_embed_groups_sum():
    cfg = CFG.talker.code_predictor
    tcfg = CFG.talker
    params = st_mod.init_subtalker_params(jax.random.PRNGKey(6), cfg, tcfg.hidden_size)
    talker_emb = jax.random.normal(jax.random.PRNGKey(7), (tcfg.vocab_size, tcfg.hidden_size))
    codes = jnp.asarray(np.random.default_rng(3).integers(0, cfg.vocab_size, (2, cfg.num_code_groups)))
    got = st_mod.embed_groups_sum(params, talker_emb, codes)
    want = np.asarray(talker_emb)[np.asarray(codes[:, 0])]
    for g in range(1, cfg.num_code_groups):
        want = want + np.asarray(params["embeds"])[g - 1][np.asarray(codes[:, g])]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_codec_decode_matches_torch_oracle():
    cfg = CFG.codec.decoder
    params = codec_mod.init_codec_params(jax.random.PRNGKey(8), cfg)
    codes = np.random.default_rng(4).integers(
        0, cfg.codebook_size, (2, 10, cfg.num_quantizers)
    ).astype(np.int32)
    got = codec_mod.codec_decode(params, cfg, jnp.asarray(codes))
    assert got.shape == (2, 10 * cfg.total_upsample)
    want = ref.codec_decode(_np(params), cfg, codes)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-3)


def test_chunked_decode_matches_full():
    """One-chunk chunked decode == direct decode; multi-chunk output has the
    right length and matches the reference chunking exactly by construction."""
    cfg = CFG.codec.decoder
    params = codec_mod.init_codec_params(jax.random.PRNGKey(9), cfg)
    codes = jnp.asarray(np.random.default_rng(5).integers(
        0, cfg.codebook_size, (1, 12, cfg.num_quantizers)
    ).astype(np.int32))
    full = codec_mod.codec_decode(params, cfg, codes)
    one_chunk = codec_mod.chunked_decode(params, cfg, codes, chunk_size=64)
    np.testing.assert_allclose(np.asarray(one_chunk), np.asarray(full), atol=1e-4)

    multi = codec_mod.chunked_decode(params, cfg, codes, chunk_size=5,
                                     left_context_size=3)
    assert multi.shape == full.shape
    # The first chunk is decoded from scratch — causality means it must match
    # the full decode. (Later chunks legitimately differ when the left context
    # is shorter than the attention window, exactly as in the reference.)
    np.testing.assert_allclose(
        np.asarray(multi[:, : 5 * cfg.total_upsample]),
        np.asarray(full[:, : 5 * cfg.total_upsample]),
        atol=1e-4,
    )
