"""Reference-in-the-loop parity for the 25Hz (V1) tokenizer family.

The V1 decode path (flow-matching DiT + BigVGAN) was previously validated
only against a builder-written torch oracle (tests/torch_ref_v1.py) — the
same shared-misreading risk class the 12Hz family retired with
tests/test_ref_parity.py. Here the ACTUAL reference decoder
(qwen_tts.core.tokenizer_25hz.modeling_...v1.Qwen3TTSTokenizerV1Decoder,
:1230-1281) runs on the fixture checkpoint and must produce the same
waveform as this framework, sharing one initial ODE noise tensor
(the reference draws torch.randn([B, 30000, mel]) inside dit.sample,
:1181-1183; we re-draw it with the same torch seed and feed it to the JAX
path via codec_v1_decode(noise=...))."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from ckpt_fixture_v1 import make_v1_checkpoint
from ref_oracle import load_ref_codec_v1
from test_codec_v1 import TINY_BIGVGAN, TINY_V1
from qwen_tts_tpu.tokenizer import Qwen3TTSTokenizer

SEED = 123

# The reference AMPBlock hard-codes 3 dilated convs per resblock
# (modeling_...v1.py:879-899 indexes dilation[2]); the generic tiny config
# elsewhere uses 2, so the ref-in-the-loop fixture pins the real shape.
TINY_V1 = dataclasses.replace(
    TINY_V1,
    bigvgan=dataclasses.replace(
        TINY_BIGVGAN, resblock_dilation_sizes=((1, 3, 5),)
    ),
)


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("v1_ref_ckpt"))
    make_v1_checkpoint(d, TINY_V1)
    tok = Qwen3TTSTokenizer.from_pretrained(d)
    dec = load_ref_codec_v1(d)
    return tok, dec


def _inputs(b=2, t_code=5, t_mel=10):
    rng = np.random.default_rng(3)
    codes = rng.integers(0, TINY_V1.dit.num_embeds, (b, t_code)).astype(
        np.int64
    )
    xv = rng.standard_normal((b, TINY_V1.dit.enc_emb_dim)).astype(np.float32)
    mel = (0.1 * rng.standard_normal((b, t_mel, TINY_V1.dit.mel_dim))).astype(
        np.float32
    )
    return codes, xv, mel


def _shared_noise(b):
    """Reproduce the exact noise dit.sample will draw under SEED."""
    torch.manual_seed(SEED)
    return torch.randn(
        [b, 30000, TINY_V1.dit.mel_dim], dtype=torch.float32
    ).numpy()


# guidance_scale=0 is untestable against the reference: its no-CFG branch
# (modeling_...v1.py:1187-1196) calls forward() with the default
# apply_cfg=True, which doubles the batch and crashes in the Euler update
# (:1223) — a latent upstream bug in a branch the shipped default (0.5)
# never exercises. We compare the two CFG-on values instead.
@pytest.mark.parametrize("guidance_scale,sway", [(0.5, -1.0), (1.0, -1.0)])
def test_v1_decode_waveform_matches_reference(stack, guidance_scale, sway):
    tok, dec = stack
    codes, xv, mel = _inputs()
    noise = _shared_noise(codes.shape[0])

    torch.manual_seed(SEED)  # consumed by dit.sample's randn
    with torch.no_grad():
        want = dec(
            code=torch.as_tensor(codes),
            conditioning=torch.as_tensor(xv),
            reference_mel=torch.as_tensor(mel),
            num_steps=10,
            guidance_scale=guidance_scale,
            sway_coefficient=sway,
        ).numpy()

    from qwen_tts_tpu.models.codec_v1 import codec_v1_decode

    got = np.asarray(codec_v1_decode(
        tok.params, tok.cfg, jnp.asarray(codes.astype(np.int32)),
        jnp.asarray(xv), jnp.asarray(mel), jax.random.PRNGKey(0),
        guidance_scale=guidance_scale, sway_coefficient=sway,
        noise=jnp.asarray(noise),
    ))

    assert got.shape == want.shape
    scale = np.abs(want).max()
    assert np.abs(got - want).max() <= 2e-3 * max(scale, 1.0), (
        f"max abs diff {np.abs(got - want).max():.2e} vs scale {scale:.2e}"
    )


def test_v1_decode_code_padding_matches_reference(stack):
    """-1-padded codes clamp to 0 before embedding (modeling_...v1.py:
    1515-1517); per-row trim happens at the wrapper layer in both stacks."""
    tok, dec = stack
    codes, xv, mel = _inputs(b=2, t_code=6)
    codes[1, 4:] = -1
    noise = _shared_noise(2)

    torch.manual_seed(SEED)
    with torch.no_grad():
        want = dec(
            code=torch.clamp(torch.as_tensor(codes), min=0),
            conditioning=torch.as_tensor(xv),
            reference_mel=torch.as_tensor(mel),
        ).numpy()

    from qwen_tts_tpu.models.codec_v1 import codec_v1_decode

    got = np.asarray(codec_v1_decode(
        tok.params, tok.cfg, jnp.asarray(codes.astype(np.int32)),
        jnp.asarray(xv), jnp.asarray(mel), jax.random.PRNGKey(0),
        noise=jnp.asarray(noise),
    ))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() <= 2e-3 * max(scale, 1.0)


def test_v1_whisper_vq_encode_codes_match_reference(tmp_path):
    """Token-exact Whisper-VQ encode parity vs the ACTUAL reference encoder
    (Qwen3TTSTokenizerV1Encoder.quantize_speech, modeling_...v1.py:1325-1340).
    n_mels is pinned to 128: speech2mel (:1305-1311) calls get_mel_audio
    without forwarding config.n_mels, so the reference front-end always
    produces 128-bin whisper mels (our slaney filterbank matches the
    reference's saved librosa mel_128 asset to ~4e-9)."""
    from ref_oracle import load_ref_encoder_v1
    from test_whisper_vq import TINY as TINY_WVQ

    enc_cfg = dataclasses.replace(TINY_WVQ, n_mels=128)
    d = str(tmp_path / "v1_enc")
    make_v1_checkpoint(d, TINY_V1, enc_cfg=enc_cfg)

    tok = Qwen3TTSTokenizer.from_pretrained(d)
    ref_enc = load_ref_encoder_v1(d)

    rng = np.random.default_rng(5)
    wavs = [
        (0.2 * rng.standard_normal(16000)).astype(np.float32),
        (0.3 * np.sin(np.linspace(0, 400, 9000))).astype(np.float32),
    ]
    with torch.no_grad():
        ref_codes, ref_lens = ref_enc.quantize_speech(
            [torch.from_numpy(w) for w in wavs]
        )

    out = tok.encode(wavs, 16000)
    for i, w in enumerate(wavs):
        ours = np.asarray(out["audio_codes"][i]).reshape(-1)
        want = np.asarray(ref_codes[i][: ref_lens[i]]).reshape(-1)
        assert ours.shape == want.shape, (ours.shape, want.shape)
        assert np.array_equal(ours, want), (
            f"wav {i}: {np.sum(ours != want)}/{ours.size} codes differ"
        )
