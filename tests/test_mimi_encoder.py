"""JAX Mimi encoder vs the actual HuggingFace MimiModel on shared weights —
the strongest possible oracle (identical parameters, identical inputs)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from ckpt_fixture import TINY_MIMI_CONFIG, make_checkpoint
from qwen_tts_tpu.io.safetensors import MultiSafeTensors
from qwen_tts_tpu.models.mimi_encoder import (
    MimiEncoderConfig,
    load_mimi_encoder,
    mimi_encode,
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("mimi_ckpt")
    make_checkpoint(str(d), with_encoders=True)
    st = MultiSafeTensors(str(d / "speech_tokenizer"))
    cfg = MimiEncoderConfig.from_dict(TINY_MIMI_CONFIG)
    params = load_mimi_encoder(st, cfg)

    from transformers import MimiConfig, MimiModel

    hf = MimiModel(MimiConfig(**TINY_MIMI_CONFIG))
    state = {}
    for name in st.keys():
        if name.startswith("encoder.") or True:
            pass
    sd = {}
    for name in st.keys():
        sd[name] = torch.from_numpy(np.asarray(st.get_f32(name)).copy())
    # checkpoint stores the whole MimiModel state under bare names prefixed
    # by "encoder." (fixture writes mimi.state_dict() with that prefix).
    hf_sd = {k[len("encoder."):]: v for k, v in sd.items()
             if k.startswith("encoder.")}
    hf.load_state_dict(hf_sd, strict=False)
    hf.eval()
    st.close()
    return d, cfg, params, hf


def test_mimi_encode_matches_hf(setup):
    _, cfg, params, hf = setup
    rng = np.random.default_rng(0)
    wav = (0.3 * np.sin(np.linspace(0, 200, 3000))
           + 0.05 * rng.standard_normal(3000)).astype(np.float32)

    got = np.asarray(mimi_encode(params, cfg, jnp.asarray(wav[None])))
    with torch.inference_mode():
        want = hf.encode(
            input_values=torch.from_numpy(wav)[None, None], return_dict=True
        ).audio_codes.numpy()
    assert got.shape == want.shape
    agreement = (got == want).mean()
    # f32 nearest-neighbour ties can flip a code at codebook boundaries;
    # demand near-perfect agreement.
    assert agreement > 0.99, f"code agreement only {agreement:.4f}"


def test_mimi_encode_batched_shapes(setup):
    _, cfg, params, _ = setup
    wavs = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 2400)).astype(np.float32) * 0.1)
    codes = mimi_encode(params, cfg, wavs, num_quantizers=4)
    assert codes.shape[0] == 2 and codes.shape[1] == 4
    assert (np.asarray(codes) >= 0).all()
    assert (np.asarray(codes) < cfg.codebook_size).all()


def test_encoder_bucketed_single_program_and_padding_invariance(setup):
    """The production SpeechTokenizerEncoder pads each batch to a LENGTH
    BUCKET and runs one jitted program: different max lengths inside one
    bucket must NOT compile a new shape, and a wav's codes must be
    identical regardless of its batch-mates / right padding (the encoder
    is causal; same contract as decode_codes(bucket=))."""
    d, _, _, _ = setup
    from qwen_tts_tpu.codec_encoder import (
        SpeechTokenizerEncoder,
        _jit_mimi_encode,
    )

    enc = SpeechTokenizerEncoder.from_pretrained(
        str(d / "speech_tokenizer"))
    sr = enc.input_sample_rate
    bucket = max(enc.downsample_rate * 8, 1)
    rng = np.random.default_rng(7)

    def wav(n):
        return (rng.standard_normal(n) * 0.1).astype(np.float32)

    w1, w2, w3 = wav(bucket // 3), wav(bucket // 2 + 7), wav(bucket - 5)
    both = enc.encode([w1, w2], sr)
    size0 = _jit_mimi_encode()._cache_size()
    enc.encode([w3, w1], sr)  # longer max length, same bucket, same batch
    assert _jit_mimi_encode()._cache_size() == size0, (
        "a second length inside the same bucket recompiled"
    )
    # padding/batch-mate invariance: w1 next to w3 == w1 next to w2
    again = enc.encode([w1, w3], sr)
    np.testing.assert_array_equal(both[0], again[0])
