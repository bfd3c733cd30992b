"""Reference-in-the-loop oracle.

Imports the actual reference implementation (/root/reference's ``qwen_tts``
PyTorch package — the semantic reference per SURVEY.md §1) and runs it on the
tiny fixture checkpoints that tests/ckpt_fixture.py writes in the reference's
on-disk format. Parity tests compare this framework's token traces / wave-
forms against the *real* reference, not against independently written
oracles, retiring the shared-misreading risk (a misport of the prompt schema
in modeling_qwen3_tts.py:2124-2233 or the sub-talker schedule in :1276-1312
would otherwise pass every self-consistency test).

librosa / soundfile / onnxruntime are absent from the image; they are stubbed
with just enough behavior for the inference code paths under test
(librosa.filters.mel delegates to this repo's slaney filterbank, which is
itself torch.stft-verified in tests/test_speaker.py).
"""

from __future__ import annotations

import importlib.machinery
import json
import os
import sys
import types
from typing import List, Optional, Sequence

import numpy as np

REF_ROOT = "/root/reference"


def _stub_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    # transformers probes deps via importlib.util.find_spec, which raises on
    # modules with __spec__ = None — give stubs a real-looking spec.
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def install_ref_stubs() -> None:
    try:
        import librosa  # noqa: F401
    except ImportError:
        from qwen_tts_tpu.models.speaker import mel_filterbank

        librosa = _stub_module("librosa")
        filters = _stub_module("librosa.filters")

        def mel(*, sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **kw):
            fmax = sr / 2.0 if fmax is None else fmax
            return mel_filterbank(sr, n_fft, n_mels, fmin, fmax).astype(
                np.float32
            )

        filters.mel = mel
        librosa.filters = filters

        def _unavailable(*a, **k):
            raise RuntimeError("librosa stub: only filters.mel is available")

        librosa.resample = _unavailable
        librosa.load = _unavailable
        sys.modules["librosa"] = librosa
        sys.modules["librosa.filters"] = filters

    try:
        import soundfile  # noqa: F401
    except ImportError:
        sf = _stub_module("soundfile")

        def _unavailable(*a, **k):
            raise RuntimeError("soundfile stub")

        sf.read = _unavailable
        sf.write = _unavailable
        sys.modules["soundfile"] = sf

    try:
        import onnxruntime  # noqa: F401
    except ImportError:
        ort = _stub_module("onnxruntime")

        class InferenceSession:  # pragma: no cover - never constructed
            def __init__(self, *a, **k):
                raise RuntimeError("onnxruntime stub")

        ort.InferenceSession = InferenceSession
        sys.modules["onnxruntime"] = ort

    try:
        import sox  # noqa: F401
    except ImportError:
        sox = _stub_module("sox")

        class Transformer:  # pragma: no cover - never constructed
            def __init__(self, *a, **k):
                raise RuntimeError("sox stub")

        sox.Transformer = Transformer
        sys.modules["sox"] = sox

    try:
        import torchaudio  # noqa: F401
    except ImportError:
        ta = _stub_module("torchaudio")
        compliance = _stub_module("torchaudio.compliance")
        kaldi = _stub_module("torchaudio.compliance.kaldi")

        def fbank(*a, **k):  # pragma: no cover - 25Hz x-vector path only
            raise RuntimeError("torchaudio stub")

        kaldi.fbank = fbank
        compliance.kaldi = kaldi
        ta.compliance = compliance
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.compliance"] = compliance
        sys.modules["torchaudio.compliance.kaldi"] = kaldi


def import_ref():
    """Import the reference package; returns its core modeling module."""
    install_ref_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import qwen_tts.core.models.modeling_qwen3_tts as m

    return m


def load_ref_tts(model_dir: str):
    """Instantiate the reference Qwen3TTSForConditionalGeneration from a
    fixture checkpoint dir (torch f32 CPU, eager attention).

    Avoids the reference's from_pretrained override (which insists on
    attaching the speech tokenizer via AutoModel registration); state dict +
    config are loaded directly, asserting every checkpoint tensor is
    consumed.
    """
    import torch
    from safetensors.torch import load_file

    m = import_ref()
    from qwen_tts.core.models.configuration_qwen3_tts import Qwen3TTSConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        cfg_json = json.load(f)
    cfg = Qwen3TTSConfig(**cfg_json)
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    model = m.Qwen3TTSForConditionalGeneration(cfg)
    state = load_file(os.path.join(model_dir, "model.safetensors"))
    missing, unexpected = model.load_state_dict(state, strict=False)
    assert not unexpected, f"checkpoint tensors not consumed: {unexpected[:5]}"
    # Missing keys may only be the speaker encoder (absent from talker-only
    # fixtures) or non-persistent-style extras; never talker/code_predictor.
    bad = [k for k in missing if k.startswith(("talker.",))]
    assert not bad, f"reference talker weights missing from fixture: {bad[:5]}"
    return model.float().eval(), cfg


def ref_generate(
    model,
    input_ids: Sequence[np.ndarray],
    *,
    languages: Sequence[str],
    speakers: Optional[Sequence[Optional[str]]] = None,
    max_new_tokens: int = 32,
    do_sample: bool = False,
    repetition_penalty: float = 1.0,
    non_streaming_mode: bool = False,
    ref_ids: Optional[Sequence[np.ndarray]] = None,
    voice_clone_prompt: Optional[dict] = None,
) -> List[np.ndarray]:
    """Greedy reference generate → per-sample [T, G] int64 codes
    (EOS-trimmed exactly as modeling_qwen3_tts.py:2283-2291 does)."""
    import torch

    ids = [torch.as_tensor(np.asarray(i), dtype=torch.long).view(1, -1)
           for i in input_ids]
    rids = None
    if ref_ids is not None:
        rids = [torch.as_tensor(np.asarray(i), dtype=torch.long).view(1, -1)
                for i in ref_ids]
    with torch.no_grad():
        codes_list, _hidden = model.generate(
            input_ids=ids,
            ref_ids=rids,
            voice_clone_prompt=voice_clone_prompt,
            languages=list(languages),
            speakers=list(speakers) if speakers is not None else None,
            non_streaming_mode=non_streaming_mode,
            max_new_tokens=max_new_tokens,
            do_sample=do_sample,
            subtalker_dosample=do_sample,
            repetition_penalty=repetition_penalty,
        )
    return [c.cpu().numpy() for c in codes_list]


def load_ref_codec(st_dir: str):
    """Instantiate the reference Qwen3TTSTokenizerV2Model from a fixture
    speech_tokenizer dir (torch f32 CPU)."""
    import torch
    from safetensors.torch import load_file

    install_ref_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from qwen_tts.core.tokenizer_12hz.configuration_qwen3_tts_tokenizer_v2 import (
        Qwen3TTSTokenizerV2Config,
    )
    from qwen_tts.core.tokenizer_12hz.modeling_qwen3_tts_tokenizer_v2 import (
        Qwen3TTSTokenizerV2Model,
    )

    with open(os.path.join(st_dir, "config.json")) as f:
        cfg_json = json.load(f)
    cfg = Qwen3TTSTokenizerV2Config(**cfg_json)
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    model = Qwen3TTSTokenizerV2Model(cfg)
    state = load_file(os.path.join(st_dir, "model.safetensors"))
    missing, unexpected = model.load_state_dict(state, strict=False)
    assert not unexpected, f"codec tensors not consumed: {unexpected[:5]}"
    bad = [k for k in missing if k.startswith("decoder.")]
    assert not bad, f"reference codec weights missing from fixture: {bad[:5]}"
    return model.float().eval()


def load_ref_codec_v1(st_dir: str):
    """Instantiate the reference 25Hz decoder (Qwen3TTSTokenizerV1Decoder:
    DiT flow-matching + BigVGAN, modeling_...v1.py:1230-1281) from a fixture
    dir written by tests/ckpt_fixture_v1.py (torch f32 CPU, sdpa attention —
    the only implementation the decoder supports, :1237-1247)."""
    import torch
    from safetensors.torch import load_file

    install_ref_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from qwen_tts.core.tokenizer_25hz.configuration_qwen3_tts_tokenizer_v1 import (
        Qwen3TTSTokenizerV1DecoderConfig,
    )
    from qwen_tts.core.tokenizer_25hz.modeling_qwen3_tts_tokenizer_v1 import (
        Qwen3TTSTokenizerV1Decoder,
    )

    with open(os.path.join(st_dir, "config.json")) as f:
        cfg_json = json.load(f)
    cfg = Qwen3TTSTokenizerV1DecoderConfig(**cfg_json["decoder_config"])
    torch.manual_seed(0)
    model = Qwen3TTSTokenizerV1Decoder(cfg)
    state = load_file(os.path.join(st_dir, "model.safetensors"))
    state = {k[len("decoder."):]: torch.as_tensor(v)
             for k, v in state.items() if k.startswith("decoder.")}
    missing, unexpected = model.load_state_dict(state, strict=False)
    assert not unexpected, f"v1 tensors not consumed: {unexpected[:5]}"
    bad = [k for k in missing
           if k.startswith(("dit.", "bigvgan.")) and "rotary" not in k]
    assert not bad, f"reference v1 weights missing from fixture: {bad[:5]}"
    return model.float().eval()


def load_ref_encoder_v1(st_dir: str):
    """Instantiate the reference 25Hz Whisper-VQ encoder
    (Qwen3TTSTokenizerV1Encoder, modeling_...v1.py:1282-1340) from a fixture
    dir written by tests/ckpt_fixture_v1.py (torch f32 CPU). Only the
    tensors the code-extraction path reads are required; the post-VQ heads
    (ln_post/proj/upsample/project_out, EMA buffers) are training-era and
    stay at init."""
    import torch
    from safetensors.torch import load_file

    install_ref_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from qwen_tts.core.tokenizer_25hz.configuration_qwen3_tts_tokenizer_v1 import (
        Qwen3TTSTokenizerV1EncoderConfig,
    )
    from qwen_tts.core.tokenizer_25hz.modeling_qwen3_tts_tokenizer_v1 import (
        Qwen3TTSTokenizerV1Encoder,
    )

    with open(os.path.join(st_dir, "config.json")) as f:
        cfg_json = json.load(f)
    torch.manual_seed(0)
    model = Qwen3TTSTokenizerV1Encoder(
        Qwen3TTSTokenizerV1EncoderConfig(**cfg_json["encoder_config"])
    )
    state = load_file(os.path.join(st_dir, "model.safetensors"))
    state = {k[len("encoder."):]: torch.as_tensor(v)
             for k, v in state.items() if k.startswith("encoder.")}
    missing, unexpected = model.load_state_dict(state, strict=False)
    assert not unexpected, f"v1 encoder tensors not consumed: {unexpected[:5]}"
    pre_vq = ("tokenizer.conv", "tokenizer.positional", "tokenizer.blocks",
              "tokenizer.audio_vq_downsample",
              "tokenizer.audio_quantizer.rvqs.0.layers.0.project_in")
    bad = [k for k in missing
           if k.startswith(pre_vq)
           or k == "tokenizer.audio_quantizer.rvqs.0.embed"]
    assert not bad, f"reference encoder weights missing from fixture: {bad[:5]}"
    return model.float().eval()
