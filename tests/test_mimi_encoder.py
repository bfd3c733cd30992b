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
    return cfg, params, hf


def test_mimi_encode_matches_hf(setup):
    cfg, params, hf = setup
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
    cfg, params, _ = setup
    wavs = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 2400)).astype(np.float32) * 0.1)
    codes = mimi_encode(params, cfg, wavs, num_quantizers=4)
    assert codes.shape[0] == 2 and codes.shape[1] == 4
    assert (np.asarray(codes) >= 0).all()
    assert (np.asarray(codes) < cfg.codebook_size).all()
