"""12 Hz speech-tokenizer *encode* path: waveform → [T, Q] codec codes.

The reference's encoder is the public HuggingFace Mimi model with its decoder
halves nulled out (Qwen3TTSTokenizerV2Encoder,
modeling_qwen3_tts_tokenizer_v2.py:899-908). The default backend here is the
native JAX port (models/mimi_encoder.py, bit-matched against HF MimiModel in
tests/test_mimi_encoder.py and against the reference V2 encode in
tests/test_ref_parity.py); a torch MimiModel fallback remains for layouts the
port doesn't recognize. Keeps the reference's trim semantics: the first
``encoder_valid_num_quantizers`` codebooks, lengths trimmed by padding mask
(modeling_...v2.py:961-991).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

_MIMI_ENCODE_JIT = None


def _jit_mimi_encode():
    """Lazy module-level jit of mimi_encode (shared across encoder
    instances; jax's jit cache keys on shapes/config)."""
    global _MIMI_ENCODE_JIT
    if _MIMI_ENCODE_JIT is None:
        import jax

        from qwen_tts_tpu.models.mimi_encoder import mimi_encode

        _MIMI_ENCODE_JIT = jax.jit(
            mimi_encode, static_argnames=("cfg", "num_quantizers")
        )
    return _MIMI_ENCODE_JIT


class SpeechTokenizerEncoder:
    def __init__(self, backend, valid_num_quantizers: int,
                 input_sample_rate: int, downsample_rate: int):
        self._backend = backend  # ("jax", cfg, params) or ("torch", model)
        self.valid_num_quantizers = valid_num_quantizers
        self.input_sample_rate = input_sample_rate
        self.downsample_rate = downsample_rate

    @classmethod
    def from_pretrained(cls, speech_tokenizer_dir: str,
                        backend: str = "jax") -> "SpeechTokenizerEncoder":
        with open(os.path.join(speech_tokenizer_dir, "config.json"),
                  encoding="utf-8") as f:
            cfg = json.load(f)
        enc_raw = cfg.get("encoder_config") or {}
        meta = dict(
            valid_num_quantizers=cfg.get("encoder_valid_num_quantizers", 16),
            input_sample_rate=cfg.get("input_sample_rate", 24000),
            downsample_rate=cfg.get("encode_downsample_rate", 1920),
        )
        if backend == "jax":
            from qwen_tts_tpu.io.safetensors import MultiSafeTensors
            from qwen_tts_tpu.models.mimi_encoder import (
                MimiEncoderConfig,
                load_mimi_encoder,
            )

            st = MultiSafeTensors(speech_tokenizer_dir)
            enc_cfg = MimiEncoderConfig.from_dict(enc_raw)
            params = load_mimi_encoder(st, enc_cfg)
            st.close()
            return cls(("jax", enc_cfg, params), **meta)

        # torch fallback (the reference's own path: HF MimiModel).
        import torch
        from transformers import MimiConfig, MimiModel

        model = MimiModel(MimiConfig(**enc_raw))
        from qwen_tts_tpu.io.safetensors import MultiSafeTensors

        st = MultiSafeTensors(speech_tokenizer_dir)
        state = {}
        for name in st.keys():
            if name.startswith("encoder."):
                state[name[len("encoder."):]] = torch.from_numpy(
                    np.asarray(st.get_f32(name)).copy()
                )
        st.close()
        model.load_state_dict(state, strict=False)
        model.eval()
        return cls(("torch", model), **meta)

    def encode(
        self, wavs: Sequence[np.ndarray], sample_rate: int
    ) -> List[np.ndarray]:
        """Each waveform → [T_i, Q] int32 codes (per-sample, unpadded)."""
        if sample_rate != self.input_sample_rate:
            from qwen_tts_tpu.audio import resample

            wavs = [resample(w, sample_rate, self.input_sample_rate)
                    for w in wavs]
        lengths = [w.shape[0] for w in wavs]
        max_len = max(lengths)
        batch = np.zeros((len(wavs), max_len), np.float32)
        for i, w in enumerate(wavs):
            batch[i, : w.shape[0]] = w

        if self._backend[0] == "jax":
            import jax
            import jax.numpy as jnp

            from qwen_tts_tpu.models.mimi_encoder import mimi_encode

            _, enc_cfg, params = self._backend
            # ONE compiled program per LENGTH BUCKET instead of eager op-by-op
            # dispatch (each eager op costs a full ~25 ms round trip over the
            # axon tunnel) or one compile per exact length. Right-padding to
            # the bucket is bit-safe: every encoder stage is causal (causal
            # convs, causal sliding-window attention), so the pad can only
            # influence frames past each sample's true length — which the
            # per-sample trim below discards. Same contract as
            # decode_codes(bucket=).
            bucket = max(self.downsample_rate * 8, 1)
            padded_len = -(-max_len // bucket) * bucket
            if padded_len > max_len:
                batch = np.pad(batch, ((0, 0), (0, padded_len - max_len)))
            codes = np.asarray(
                _jit_mimi_encode()(params, enc_cfg, jnp.asarray(batch))
            )[:, : self.valid_num_quantizers]
        else:
            import torch

            with torch.inference_mode():
                out = self._backend[1].encode(
                    input_values=torch.from_numpy(batch).unsqueeze(1),
                    return_dict=True,
                )
            codes = out.audio_codes[:, : self.valid_num_quantizers].cpu().numpy()

        result = []
        for i, n in enumerate(lengths):
            t = -(-n // self.downsample_rate)  # ceil
            result.append(
                np.ascontiguousarray(codes[i, :, :t].T).astype(np.int32)
            )
        return result


def resample_linear(wav: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Simple linear-interpolation resampler (librosa-free cold path)."""
    if sr_in == sr_out:
        return np.asarray(wav, np.float32)
    n_out = int(round(wav.shape[0] * sr_out / sr_in))
    x_out = np.linspace(0.0, wav.shape[0] - 1, n_out)
    return np.interp(x_out, np.arange(wav.shape[0]), wav).astype(np.float32)
