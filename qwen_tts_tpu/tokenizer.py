"""Unified speech-tokenizer wrapper — the reference `Qwen3TTSTokenizer`
(inference/qwen3_tts_tokenizer.py): detects the tokenizer family from
``config.json`` ``model_type`` and exposes ``encode`` / ``decode`` over both:

* ``qwen3_tts_tokenizer_12hz`` (V2): codes [T, 16] ↔ 24 kHz waveform
  (JAX decoder; HF-Mimi encode cold path)
* ``qwen3_tts_tokenizer_25hz`` (V1): codes [T] + x-vector + ref-mel →
  flow-matching DiT + BigVGAN decode (JAX). Encode (Whisper-VQ + CAM++ ONNX
  x-vector) requires assets this round does not ship — precomputed inputs are
  accepted in the reference dict layout.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qwen_tts_tpu.config import CodecConfig, CodecV1Config


class Qwen3TTSTokenizer:
    def __init__(self, model_type: str, cfg, params, model_dir: Optional[str] = None):
        self.model_type = model_type
        self.cfg = cfg
        self.params = params
        self.model_dir = model_dir
        self._encoder = None
        self._xvector = None  # lazily: CampplusXVector | False (no asset)

    # ------------------------------------------------------------------

    @classmethod
    def from_pretrained(cls, model_dir: str, *, dtype=jnp.float32
                        ) -> "Qwen3TTSTokenizer":
        with open(os.path.join(model_dir, "config.json"), encoding="utf-8") as f:
            raw = json.load(f)
        model_type = raw.get("model_type", "qwen3_tts_tokenizer_12hz")
        if model_type == "qwen3_tts_tokenizer_25hz":
            cfg = CodecV1Config.from_dict(raw)
            from qwen_tts_tpu.io.loader_v1 import load_codec_v1

            params = load_codec_v1(model_dir, cfg, dtype)
        else:
            cfg = CodecConfig.from_dict(raw)
            from qwen_tts_tpu.io.loader import load_codec
            from qwen_tts_tpu.io.safetensors import MultiSafeTensors

            st = MultiSafeTensors(model_dir)
            params = load_codec(st, cfg.decoder, dtype)
            st.close()
        return cls(model_type, cfg, params, model_dir)

    def get_model_type(self) -> str:
        return self.model_type

    def get_output_sample_rate(self) -> int:
        return self.cfg.output_sample_rate

    def get_input_sample_rate(self) -> int:
        return self.cfg.input_sample_rate

    def get_decode_upsample_rate(self) -> int:
        return self.cfg.decode_upsample_rate

    def get_encode_downsample_rate(self) -> int:
        return self.cfg.encode_downsample_rate

    # ------------------------------------------------------------------

    def load_audio(self, x: str, target_sr: int) -> np.ndarray:
        """Load audio from a wav path / URL / base64 string and resample to
        ``target_sr`` (reference qwen3_tts_tokenizer.py:122-158; librosa is
        replaced by the windowed-sinc polyphase resampler in audio.py)."""
        from qwen_tts_tpu.audio import load_audio, resample

        wav, sr = load_audio(x)
        if wav.ndim > 1:
            wav = wav.mean(axis=-1)
        return resample(wav.astype(np.float32), sr, target_sr)

    def _normalize_inputs(self, audios, sample_rate: Optional[int]
                          ) -> Tuple[List[np.ndarray], int]:
        """Accept str (path/URL/base64), np.ndarray (+ ``sample_rate``),
        (np.ndarray, sr) tuples, or lists thereof → list of waveforms all at
        one common rate (reference _normalize_audio_inputs semantics; numpy
        input without a rate is rejected)."""
        from qwen_tts_tpu.audio import normalize_audio_inputs, resample

        if isinstance(audios, np.ndarray):
            if sample_rate is None:
                raise ValueError(
                    "For numpy waveform input, provide sample_rate.")
            audios = [(audios, int(sample_rate))]
        elif (isinstance(audios, (list, tuple)) and audios
              and isinstance(audios[0], np.ndarray)
              and not (len(audios) == 2
                       and isinstance(audios[1], (int, np.integer)))):
            if sample_rate is None:
                raise ValueError(
                    "For numpy waveform input, provide sample_rate.")
            audios = [(a, int(sample_rate)) for a in audios]
        items = normalize_audio_inputs(audios)
        target = int(self.get_input_sample_rate())
        return [resample(w, sr, target) if sr != target else w
                for w, sr in items], target

    def encode(self, wavs, sample_rate: Optional[int] = None):
        wavs, sample_rate = self._normalize_inputs(wavs, sample_rate)
        if self.model_type == "qwen3_tts_tokenizer_12hz":
            from qwen_tts_tpu.codec_encoder import SpeechTokenizerEncoder

            if self._encoder is None:
                self._encoder = SpeechTokenizerEncoder.from_pretrained(self.model_dir)
            return {"audio_codes": self._encoder.encode(wavs, sample_rate)}

        # 25Hz: Whisper-VQ codes + BigVGAN-style ref mels run natively; the
        # CAM++ x-vector runs through the in-repo ONNX executor when the
        # checkpoint ships campplus.onnx (modeling_...v1.py:1426-1446) —
        # otherwise callers supply precomputed xvectors for decode.
        from qwen_tts_tpu.audio import resample
        from qwen_tts_tpu.models import whisper_vq as wvq

        if self._encoder is None:
            with open(os.path.join(self.model_dir, "config.json"),
                      encoding="utf-8") as f:
                raw = json.load(f)
            enc_raw = raw.get("encoder_config") or {}
            import dataclasses as _dc

            keys = {f.name for f in _dc.fields(wvq.WhisperVQConfig)}
            enc_cfg = wvq.WhisperVQConfig(
                **{k: v for k, v in enc_raw.items() if k in keys}
            )
            from qwen_tts_tpu.io.safetensors import MultiSafeTensors

            st = MultiSafeTensors(self.model_dir)
            enc_params = wvq.load_whisper_vq(st, enc_cfg)
            st.close()
            self._encoder = (enc_cfg, enc_params)
        enc_cfg, enc_params = self._encoder
        wavs16 = [resample(np.asarray(w, np.float32), sample_rate,
                                  wvq.SAMPLE_RATE) for w in wavs]
        codes = wvq.encode_waveforms(enc_params, enc_cfg, wavs16)
        ref_mels = [wvq.v1_ref_mel(w) for w in wavs16]
        xvectors = None
        if self._xvector is None:
            from qwen_tts_tpu.models.campplus import CampplusXVector

            self._xvector = (
                CampplusXVector.maybe_from_dir(self.model_dir) or False
            )
        if self._xvector:
            xvectors = [self._xvector.extract(w) for w in wavs16]
        return {"audio_codes": codes, "ref_mels": ref_mels,
                "xvectors": xvectors}

    def decode(self, encoded, *, seed: int = 0) -> Tuple[List[np.ndarray], int]:
        """Reference-compatible payloads: encode() output, a dict, or a list
        of dicts (qwen3_tts_tokenizer.py:259-365)."""
        if isinstance(encoded, list):
            audio_codes = [np.asarray(e["audio_codes"]) for e in encoded]
            xvectors = ([np.asarray(e["xvectors"]) for e in encoded]
                        if "xvectors" in encoded[0] else None)
            ref_mels = ([np.asarray(e["ref_mels"]) for e in encoded]
                        if "ref_mels" in encoded[0] else None)
        elif isinstance(encoded, dict):
            audio_codes = [np.asarray(c) for c in encoded["audio_codes"]]
            xvectors = ([np.asarray(x) for x in encoded["xvectors"]]
                        if encoded.get("xvectors") is not None else None)
            ref_mels = ([np.asarray(m) for m in encoded["ref_mels"]]
                        if encoded.get("ref_mels") is not None else None)
        else:
            raise TypeError("encoded must be a dict or list of dicts")

        if self.model_type == "qwen3_tts_tokenizer_25hz":
            return self._decode_v1(audio_codes, xvectors, ref_mels, seed)
        return self._decode_v2(audio_codes)

    def _decode_v2(self, codes_list):
        from qwen_tts_tpu.models import codec as codec_mod

        dec = self.cfg.decoder
        lengths = [c.shape[0] for c in codes_list]
        t_max = max(lengths)
        batch = np.full((len(codes_list), t_max, dec.num_quantizers), -1, np.int32)
        for i, c in enumerate(codes_list):
            batch[i, : c.shape[0]] = c[:, : dec.num_quantizers]
        wav = np.asarray(codec_mod.chunked_decode(
            self.params, dec, jnp.asarray(batch)
        ))
        up = self.cfg.decode_upsample_rate
        return ([wav[i, : lengths[i] * up] for i in range(len(codes_list))],
                self.cfg.output_sample_rate)

    def _decode_v1(self, codes_list, xvectors, ref_mels, seed):
        if xvectors is None or ref_mels is None:
            raise ValueError("25Hz decode requires `xvectors` and `ref_mels`")
        from qwen_tts_tpu.models.codec_v1 import codec_v1_decode

        lengths = [int(np.asarray(c).reshape(-1).shape[0]) for c in codes_list]
        t_max = max(lengths)
        codes = np.full((len(codes_list), t_max), -1, np.int32)
        for i, c in enumerate(codes_list):
            codes[i, : lengths[i]] = np.asarray(c).reshape(-1)
        xv = np.stack([np.asarray(x, np.float32) for x in xvectors])
        mel_lens = [m.shape[0] for m in ref_mels]
        mel = np.zeros((len(ref_mels), max(mel_lens), ref_mels[0].shape[-1]),
                       np.float32)
        for i, m in enumerate(ref_mels):
            mel[i, : m.shape[0]] = m
        wav = np.asarray(codec_v1_decode(
            self.params, self.cfg, jnp.asarray(codes), jnp.asarray(xv),
            jnp.asarray(mel), jax.random.PRNGKey(seed),
        ))
        up = self.cfg.decode_upsample_rate
        return ([wav[i, : lengths[i] * up] for i in range(len(codes_list))],
                self.cfg.output_sample_rate)
