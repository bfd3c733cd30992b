"""25 Hz (V1) codec decoder: component + full-model parity vs torch oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

import torch_ref_v1 as ref
from qwen_tts_tpu.config import BigVGANConfig, CodecV1Config, DiTConfig
from qwen_tts_tpu.models import codec_v1 as v1

RNG = np.random.default_rng(0)

TINY_DIT = DiTConfig(
    hidden_size=32,
    num_hidden_layers=3,
    num_attention_heads=4,
    ff_mult=2,
    emb_dim=16,
    head_dim=8,
    block_size=4,
    look_ahead_layers=(1,),
    look_backward_layers=(0,),
    repeats=2,
    num_embeds=64,
    mel_dim=8,
    enc_emb_dim=12,
    enc_dim=16,
    enc_channels=(16, 16, 16, 16, 48),
    enc_kernel_sizes=(5, 3, 3, 3, 1),
    enc_dilations=(1, 2, 3, 4, 1),
    enc_attention_channels=8,
    enc_res2net_scale=4,
    enc_se_channels=8,
)
TINY_BIGVGAN = BigVGANConfig(
    mel_dim=8,
    upsample_initial_channel=32,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
    upsample_rates=(2, 2, 2),
    upsample_kernel_sizes=(4, 4, 4),
)
TINY_V1 = CodecV1Config(dit=TINY_DIT, bigvgan=TINY_BIGVGAN,
                        decode_upsample_rate=16)


def test_kaiser_filter_matches_torch():
    for cutoff, hw, k in [(0.25, 0.3, 12), (0.25, 0.3, 11), (0.1, 0.12, 24)]:
        got = v1.kaiser_sinc_filter1d(cutoff, hw, k)
        # torch oracle built the same way
        import math

        even = k % 2 == 0
        half = k // 2
        delta_f = 4 * hw
        att = 2.285 * (half - 1) * math.pi * delta_f + 7.95
        if att > 50.0:
            beta = 0.1102 * (att - 8.7)
        elif att >= 21.0:
            beta = 0.5842 * (att - 21) ** 0.4 + 0.07886 * (att - 21.0)
        else:
            beta = 0.0
        window = torch.kaiser_window(k, beta=beta, periodic=False)
        if even:
            ti = torch.arange(-half, half) + 0.5
        else:
            ti = torch.arange(k) - half
        filt = 2 * cutoff * window * torch.sinc(2 * cutoff * ti)
        filt = filt / filt.sum()
        np.testing.assert_allclose(got, filt.numpy(), atol=1e-6)


def test_interleaved_rope_matches_torch():
    cos, sin = v1._interleaved_rope_tables(10, 8, 10000.0)
    tcos, tsin = ref.interleaved_rope_tables(10, 8, 10000.0)
    np.testing.assert_allclose(np.asarray(cos), tcos.numpy(), atol=1e-5)
    x = RNG.standard_normal((2, 10, 4, 8)).astype(np.float32)
    got = v1._apply_rope_interleaved(jnp.asarray(x), cos[None, :, None], sin[None, :, None])
    want = torch.from_numpy(x) * tcos[None, :, None] + ref.rotate_pairs(
        torch.from_numpy(x)) * tsin[None, :, None]
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def test_anti_aliased_snake_matches_torch():
    filters = v1.make_aa_filters()
    c = 6
    x = RNG.standard_normal((2, 40, c)).astype(np.float32)
    alpha = np.exp(0.1 * RNG.standard_normal(c)).astype(np.float32)
    beta = np.exp(0.1 * RNG.standard_normal(c)).astype(np.float32)
    got = v1._anti_aliased_snake(jnp.asarray(x), jnp.asarray(alpha),
                                 jnp.asarray(beta),
                                 filters["up"], filters["down"])
    want = ref.aa_snake(torch.from_numpy(x).permute(0, 2, 1), alpha, beta,
                        np.asarray(filters["up"]), np.asarray(filters["down"]))
    np.testing.assert_allclose(np.asarray(got), want.permute(0, 2, 1).numpy(),
                               atol=1e-4)


def test_conv_transpose_same_matches_torch():
    for cin, cout, k, s in [(8, 4, 4, 2), (6, 3, 11, 5), (4, 2, 7, 3)]:
        x = RNG.standard_normal((2, 9, cin)).astype(np.float32)
        w = RNG.standard_normal((k, cin, cout)).astype(np.float32)
        b = RNG.standard_normal(cout).astype(np.float32)
        got = v1._conv_transpose_same(jnp.asarray(x), jnp.asarray(w),
                                      jnp.asarray(b), stride=s)
        want = ref.conv_transpose_same(torch.from_numpy(x).permute(0, 2, 1),
                                       w, b, s).permute(0, 2, 1)
        assert got.shape == tuple(want.shape)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)


def test_dit_forward_matches_torch():
    cfg = TINY_DIT
    params = v1.init_dit_params(jax.random.PRNGKey(0), cfg)
    b, t_code = 2, 6
    t_mel = t_code * cfg.repeats
    noisy = RNG.standard_normal((b, t_mel, cfg.mel_dim)).astype(np.float32)
    spk = RNG.standard_normal((b, t_mel, cfg.enc_dim)).astype(np.float32)
    code = RNG.standard_normal((b, t_mel, cfg.emb_dim)).astype(np.float32)
    xvec = RNG.standard_normal((b, t_mel, cfg.enc_emb_dim)).astype(np.float32)
    ts = np.array([0.3, 0.7], np.float32)

    got = v1.dit_forward(params, cfg, jnp.asarray(noisy), jnp.asarray(spk),
                         jnp.asarray(code), jnp.asarray(xvec), jnp.asarray(ts))
    pnp = jax.tree_util.tree_map(np.asarray, params)
    want = ref.dit_forward(pnp, cfg, noisy, spk, code, xvec, ts)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4)


def test_bigvgan_matches_torch():
    cfg = TINY_BIGVGAN
    params = v1.init_bigvgan_params(jax.random.PRNGKey(1), cfg)
    mel = (0.3 * RNG.standard_normal((2, 12, cfg.mel_dim))).astype(np.float32)
    got = v1.bigvgan_forward(params, cfg, jnp.asarray(mel))
    assert got.shape == (2, 12 * cfg.total_upsample)
    pnp = jax.tree_util.tree_map(np.asarray, params)
    want = ref.bigvgan_forward(pnp, cfg, mel)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4)


def test_full_v1_decode_shapes_and_determinism():
    cfg = TINY_V1
    params = v1.init_codec_v1_params(jax.random.PRNGKey(2), cfg)
    codes = jnp.asarray(RNG.integers(0, cfg.dit.num_embeds, (2, 5)), jnp.int32)
    xv = jnp.asarray(RNG.standard_normal((2, cfg.dit.enc_emb_dim)), jnp.float32)
    mel = jnp.asarray(0.1 * RNG.standard_normal((2, 10, cfg.dit.mel_dim)),
                      jnp.float32)
    wav = v1.codec_v1_decode(params, cfg, codes, xv, mel,
                             jax.random.PRNGKey(0))
    # 5 codes × repeats 2 × bigvgan upsample 8 = 80 samples
    assert wav.shape == (2, 5 * cfg.dit.repeats * cfg.bigvgan.total_upsample)
    assert np.isfinite(np.asarray(wav)).all()
    wav2 = v1.codec_v1_decode(params, cfg, codes, xv, mel,
                              jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(wav), np.asarray(wav2))
    # Different noise seed → different mel → (generally) different audio.
    wav3 = v1.codec_v1_decode(params, cfg, codes, xv, mel,
                              jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(wav), np.asarray(wav3))


def test_block_local_attention_matches_dense_oracle():
    """The block-local DiT attention (serving fast path) must equal the
    dense masked form (reference semantics, kept as the in-repo oracle)
    for every look_back/look_ahead combination, including a T that does
    not divide the block size."""
    import qwen_tts_tpu.models.codec_v1 as v1

    rng = jax.random.PRNGKey(0)
    b, t, heads, hd, block = 2, 53, 4, 16, 8
    d = heads * hd
    shapes = {"wq": (d, d), "bq": (d,), "wk": (d, d), "bk": (d,),
              "wv": (d, d), "bv": (d,), "wo": (d, d), "bo": (d,)}
    layer = {k: jax.random.normal(jax.random.fold_in(rng, i), s) * 0.1
             for i, (k, s) in enumerate(shapes.items())}
    x = jax.random.normal(jax.random.fold_in(rng, 99), (b, t, d))
    cos, sin = v1._interleaved_rope_tables(t, hd, 10000.0)
    cos_h, sin_h = v1._halfsplit_rope_tables(t, hd, 10000.0)
    layer_hs = v1._rope_halfsplit_layer(layer, heads, hd)
    for lb, la in [(0, 0), (1, 0), (0, 1), (1, 1)]:
        mask = v1._block_mask(t, block, lb, la)
        dense = v1._dit_attention(layer, x, cos, sin, mask, heads, hd)
        local = v1._dit_attention_local(layer, x, cos, sin, lb, la, block,
                                        heads, hd)
        np.testing.assert_allclose(np.asarray(local), np.asarray(dense),
                                   atol=1e-5, rtol=1e-5)
        # Half-split rope (permuted wq/wk + half-split tables) — identical
        # attention: q'·k' is permutation-invariant.
        local_hs = v1._dit_attention_local(layer_hs, x, cos_h, sin_h, lb, la,
                                           block, heads, hd, halfsplit=True)
        np.testing.assert_allclose(np.asarray(local_hs), np.asarray(dense),
                                   atol=1e-5, rtol=1e-5)
        # Batch-dim-ordered score einsum (measured-neutral option).
        local_bo = v1._dit_attention_local(layer_hs, x, cos_h, sin_h, lb, la,
                                           block, heads, hd, halfsplit=True,
                                           batch_order=True)
        np.testing.assert_allclose(np.asarray(local_bo), np.asarray(dense),
                                   atol=1e-5, rtol=1e-5)
        # Lane-packed chunked tiles (several chunk widths incl. non-dividing).
        for g in (1, 3, 5):
            ch = v1._dit_attention_chunked(layer, x, cos, sin, lb, la, block,
                                           heads, hd, chunk_blocks=g)
            np.testing.assert_allclose(np.asarray(ch), np.asarray(dense),
                                       atol=1e-5, rtol=1e-5)
            ch_hs = v1._dit_attention_chunked(layer_hs, x, cos_h, sin_h, lb,
                                              la, block, heads, hd,
                                              chunk_blocks=g, halfsplit=True)
            np.testing.assert_allclose(np.asarray(ch_hs), np.asarray(dense),
                                       atol=1e-5, rtol=1e-5)


def test_aa_snake_phase_split_matches_conv_form():
    """The phase-split AA-snake fast paths (shift-FMA `poly` and depthwise
    `polyc`) must equal the direct 2×-rate conv form for the BigVGAN
    kernel-12/ratio-2 defaults, including edge-replication at both ends
    and T shorter than the filter."""
    filters = v1.make_aa_filters()
    for t, c in [(1, 3), (7, 4), (40, 6), (128, 96)]:
        x = RNG.standard_normal((2, t, c)).astype(np.float32)
        alpha = np.exp(0.1 * RNG.standard_normal(c)).astype(np.float32)
        beta = np.exp(0.1 * RNG.standard_normal(c)).astype(np.float32)
        want = v1._anti_aliased_snake_conv(
            jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta),
            filters["up"], filters["down"])
        for fn in (v1._aa_snake_poly, v1._aa_snake_polyc):
            got = fn(jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta),
                     filters["up"], filters["down"])
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-5)


def test_dit_forward_impls_agree():
    """dit_forward's serving attention impls (local_hs / chunked /
    chunked_hs) must match the reference-shaped `local` path on a config
    that exercises all three window kinds."""
    cfg = TINY_DIT
    params = v1.init_dit_params(jax.random.PRNGKey(3), cfg)
    b, t_code = 2, 7
    t_mel = t_code * cfg.repeats
    noisy = RNG.standard_normal((b, t_mel, cfg.mel_dim)).astype(np.float32)
    spk = RNG.standard_normal((b, t_mel, cfg.enc_dim)).astype(np.float32)
    code = RNG.standard_normal((b, t_mel, cfg.emb_dim)).astype(np.float32)
    xvec = RNG.standard_normal((b, t_mel, cfg.enc_emb_dim)).astype(np.float32)
    ts = np.array([0.3, 0.7], np.float32)
    outs = {impl: np.asarray(v1.dit_forward(
        params, cfg, jnp.asarray(noisy), jnp.asarray(spk), jnp.asarray(code),
        jnp.asarray(xvec), jnp.asarray(ts), attn_impl=impl))
        for impl in ("local", "local_hs", "chunked", "chunked_hs")}
    for impl in ("local_hs", "chunked", "chunked_hs"):
        np.testing.assert_allclose(outs[impl], outs["local"],
                                   atol=2e-5, rtol=2e-5)
