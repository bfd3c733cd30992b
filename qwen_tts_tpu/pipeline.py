"""User-facing API mirroring the reference `Qwen3TTSModel`
(inference/qwen3_tts_model.py): from_pretrained / generate_custom_voice /
generate_voice_design / generate_voice_clone / get_supported_*.

This is the glue layer: tokenize → build dual-track prompts → one jitted
prefill+decode program → per-row EOS trim → chunked codec decode → waveforms.
The hot paths live in generate.py / models/*; everything here is thin host
orchestration.
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from qwen_tts_tpu.config import TTSConfig
from qwen_tts_tpu.generate import (
    GenerationParams,
    Prompt,
    batch_prompts,
    build_prompt,
    decode_segment,
    generate_codes,
    init_decode,
)
from qwen_tts_tpu.io.loader import load_checkpoint
from qwen_tts_tpu.models import codec as codec_mod
from qwen_tts_tpu.models import subtalker as st_mod

MaybeList = Union[str, List[str]]

_HARD_DEFAULTS = dict(
    do_sample=True, top_k=50, top_p=1.0, temperature=0.9,
    repetition_penalty=1.05, subtalker_dosample=True, subtalker_top_k=50,
    subtalker_top_p=1.0, subtalker_temperature=0.9, max_new_tokens=2048,
)


@partial(
    jax.jit,
    static_argnames=("talker_cfg", "dec_cfg", "sampling", "st_sampling",
                     "max_cache_len", "first_segment", "kv_int8", "st_env"),
)
def _first_packet_program_jit(
    talker_params, st_params, codec_params, talker_cfg, dec_cfg,
    embeds, mask, trailing, *, sampling, st_sampling, max_cache_len, rng,
    first_segment, step_limit, kv_int8=False, st_env=(),
):
    """Prefill + first decode segment + codec decode of that segment as ONE
    device program. Over the axon tunnel every dispatch costs ~20-25 ms, so
    first-packet latency is dominated by round trips, not compute — this
    collapses request→audio to a single dispatch (the Metal backend's
    command-buffer batching taken to its limit,
    metal/qwen_tts_talker.c:996-1026)."""
    state, seg = init_decode(
        talker_params, st_params, talker_cfg, embeds, mask,
        sampling=sampling, st_sampling=st_sampling,
        max_cache_len=max_cache_len, rng=rng,
        first_segment=first_segment, trailing=trailing,
        step_limit=step_limit, kv_int8=kv_int8,
    )
    window = jnp.maximum(seg[:, :first_segment, : dec_cfg.num_quantizers], 0)
    wav = codec_mod.codec_decode(codec_params, dec_cfg, window)
    return state, seg, wav


def _first_packet_program(*args, **kwargs):
    """Public entry; see generate.init_decode for the st_env cache key."""
    kwargs.setdefault("st_env", st_mod.st_env_token())
    return _first_packet_program_jit(*args, **kwargs)


class Qwen3TTSModel:
    """TPU-native Qwen3-TTS inference pipeline."""

    def __init__(
        self,
        cfg: TTSConfig,
        talker_params: dict,
        subtalker_params: dict,
        codec_params: Optional[dict] = None,
        tokenizer=None,
        generate_defaults: Optional[Dict[str, Any]] = None,
        speaker_params: Optional[dict] = None,
    ):
        self.cfg = cfg
        self.talker_params = talker_params
        self.subtalker_params = subtalker_params
        self.codec_params = codec_params
        self.speaker_params = speaker_params
        self.tokenizer = tokenizer
        self.generate_defaults = generate_defaults or {}
        self.kv_int8 = False  # opt-in via quantize_for_serving(kv=True)
        self.model_dir: Optional[str] = None
        self._speech_encoder = None
        self._codec_decode_jit = jax.jit(codec_mod.codec_decode, static_argnums=1)

    @property
    def speech_encoder(self):
        """Lazy 12 Hz encode path (voice-clone prompts / data prep)."""
        if self._speech_encoder is None:
            if self.model_dir is None:
                raise RuntimeError("no model_dir — load via from_pretrained")
            from qwen_tts_tpu.codec_encoder import SpeechTokenizerEncoder

            self._speech_encoder = SpeechTokenizerEncoder.from_pretrained(
                os.path.join(self.model_dir, "speech_tokenizer")
            )
        return self._speech_encoder

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        model_dir: str,
        *,
        talker_dtype=jnp.bfloat16,
        codec_dtype=jnp.float32,
        load_tokenizer: bool = True,
    ) -> "Qwen3TTSModel":
        cfg, talker, subtalker, codec, speaker = load_checkpoint(
            model_dir, talker_dtype=talker_dtype, codec_dtype=codec_dtype
        )
        tokenizer = None
        if load_tokenizer:
            try:
                from transformers import AutoTokenizer

                tokenizer = AutoTokenizer.from_pretrained(model_dir)
            except Exception:
                tokenizer = None  # pre-tokenized-ids path still works
        gen_defaults: Dict[str, Any] = {}
        gc_path = os.path.join(model_dir, "generation_config.json")
        if os.path.exists(gc_path):
            with open(gc_path, encoding="utf-8") as f:
                gen_defaults = json.load(f)
        obj = cls(cfg, talker, subtalker, codec, tokenizer, gen_defaults,
                  speaker_params=speaker)
        obj.model_dir = model_dir
        return obj

    def quantize_for_serving(self, *, talker: bool = False,
                             kv: bool = False) -> "Qwen3TTSModel":
        """Opt-in int8 weight quantization of the decode hot path (the
        sub-talker trunk is re-streamed from HBM G× per frame; int8 halves
        that traffic — measured 1.8× on the micro-decode, ~1.5× end-to-end at
        b32 on v5e). Changes numerics (int8 rounding), so greedy token traces
        are no longer bit-identical to the bf16 path — a serving-throughput
        mode, not the parity default. In-place; returns self.

        ``kv=True`` additionally stores the talker KV cache int8 (per-token
        per-head scales, ops/attention.quantize_kv): ~0.52× cache HBM bytes —
        the cache is the serving-batch capacity ceiling (bf16 b96 OOMs at
        flagship dims) and ~1.3 ms of the per-frame budget."""
        from qwen_tts_tpu.models.subtalker import (
            quantize_subtalker_tables_int8,
        )
        from qwen_tts_tpu.models.trunk import quantize_trunk_int8

        self.subtalker_params = dict(self.subtalker_params)
        self.subtalker_params["trunk"] = quantize_trunk_int8(
            self.subtalker_params["trunk"]
        )
        self.subtalker_params = quantize_subtalker_tables_int8(
            self.subtalker_params
        )
        if talker:
            self.talker_params = dict(self.talker_params)
            self.talker_params["trunk"] = quantize_trunk_int8(
                self.talker_params["trunk"]
            )
        if kv:
            self.kv_int8 = True
        return self

    # ------------------------------------------------------------------
    # Introspection (reference: modeling_qwen3_tts.py:1849-1853)
    # ------------------------------------------------------------------

    def get_supported_speakers(self) -> List[str]:
        return [name for name, _ in self.cfg.talker.spk_id]

    def get_supported_languages(self) -> List[str]:
        langs = ["auto"]
        for name, _ in self.cfg.talker.codec_language_id:
            if "dialect" not in name:
                langs.append(name)
        return langs

    @property
    def sample_rate(self) -> int:
        return self.cfg.codec.output_sample_rate

    # ------------------------------------------------------------------
    # Tokenization (reference: qwen3_tts_model.py:269-285)
    # ------------------------------------------------------------------

    @staticmethod
    def build_assistant_text(text: str) -> str:
        return f"<|im_start|>assistant\n{text}<|im_end|>\n<|im_start|>assistant\n"

    @staticmethod
    def build_ref_text(text: str) -> str:
        return f"<|im_start|>assistant\n{text}<|im_end|>\n"

    @staticmethod
    def build_instruct_text(instruct: str) -> str:
        return f"<|im_start|>user\n{instruct}<|im_end|>\n"

    def _tokenize(self, text: str) -> np.ndarray:
        if self.tokenizer is None:
            raise RuntimeError(
                "No tokenizer loaded; pass pre-tokenized ids via *_from_ids"
            )
        return np.asarray(self.tokenizer(text)["input_ids"], np.int32)

    def _merge_params(self, **user) -> GenerationParams:
        def pick(name):
            v = user.get(name)
            if v is not None:
                return v
            if name in self.generate_defaults:
                return self.generate_defaults[name]
            return _HARD_DEFAULTS[name]

        return GenerationParams(
            max_new_tokens=pick("max_new_tokens"),
            do_sample=pick("do_sample"),
            top_k=pick("top_k"),
            top_p=pick("top_p"),
            temperature=pick("temperature"),
            repetition_penalty=pick("repetition_penalty"),
            subtalker_do_sample=pick("subtalker_dosample"),
            subtalker_top_k=pick("subtalker_top_k"),
            subtalker_top_p=pick("subtalker_top_p"),
            subtalker_temperature=pick("subtalker_temperature"),
            seed=user.get("seed", 0) or 0,
        )

    # ------------------------------------------------------------------
    # Core generation
    # ------------------------------------------------------------------

    def generate_codes_from_prompts(
        self, prompts: Sequence[Prompt], params: GenerationParams,
        *, trim_last_on_budget: bool = True,
        step_limit: Optional[Sequence[int]] = None,
        max_new_ceiling: Optional[int] = None,
        pad_batch_to: Optional[int] = None,
        trailing_bucket: Optional[int] = None,
    ) -> Tuple[List[np.ndarray], Dict[str, Any]]:
        """Run the jitted decode loop; returns per-utterance [T_i, G] codes.

        The keyword shape knobs exist for SERVING: a window engine that lets
        each request choose its own max_new_tokens / batch assembles windows
        of varying (batch, budget, trailing) shapes, and every unique shape
        of the decode while-loop is an XLA compile measured in MINUTES on
        TPU. ``max_new_ceiling`` compiles one program at the engine budget
        and serves any smaller per-row ``step_limit`` dynamically;
        ``pad_batch_to`` pads the window with copies of row 0 pinned to a
        1-frame budget (discarded on return); ``trailing_bucket`` rounds the
        trailing-text axis (pad rows are tts_pad — semantics-free)."""
        n_real = len(prompts)
        if pad_batch_to and pad_batch_to > n_real:
            prompts = list(prompts) + [prompts[0]] * (pad_batch_to - n_real)
            limits = list(step_limit) if step_limit is not None else \
                [params.max_new_tokens] * n_real
            step_limit = limits + [1] * (pad_batch_to - n_real)
        embeds, mask, trailing, _ = batch_prompts(
            prompts, trailing_bucket=trailing_bucket)
        out = generate_codes(
            self.talker_params,
            self.subtalker_params,
            self.cfg.talker,
            jnp.asarray(embeds, self.talker_params["norm"].dtype),
            jnp.asarray(mask),
            jnp.asarray(trailing, self.talker_params["norm"].dtype),
            sampling=params.talker_sampling(),
            st_sampling=params.subtalker_sampling(),
            max_new_tokens=max_new_ceiling or params.max_new_tokens,
            rng=jax.random.PRNGKey(params.seed),
            trim_last_on_budget=trim_last_on_budget,
            kv_int8=self.kv_int8,
            step_limit=(None if step_limit is None
                        else np.asarray(step_limit, np.int32)),
        )
        codes = np.asarray(out.codes)[:n_real]
        num_gen = np.asarray(out.num_gen)[:n_real]
        per_row = [codes[i, : num_gen[i]] for i in range(codes.shape[0])]
        info = {"num_gen": num_gen, "stopped": np.asarray(out.stopped)[:n_real]}
        return per_row, info

    def decode_codes(self, codes_list: Sequence[np.ndarray], *,
                     bucket: Optional[int] = None) -> List[np.ndarray]:
        """[T_i, G] codes → waveforms, batched with -1 padding then trimmed by
        true length (reference: modeling_...v2.py:993-1024).

        ``bucket`` rounds the padded length up to a multiple, bounding the
        number of compiled codec shapes under heterogeneous request lengths
        (serving: every unique length is otherwise a fresh XLA compile —
        measured at ~6.7 s/request of compile stall in the TPU soak). The
        codec is causal (sliding-window causal attention + causal convs), so
        right-padding never changes the trimmed region."""
        if self.codec_params is None:
            raise RuntimeError("codec decoder weights not loaded")
        dec_cfg = self.cfg.codec.decoder
        nq = dec_cfg.num_quantizers
        lengths = [c.shape[0] for c in codes_list]
        if not lengths or max(lengths) == 0:
            return [np.zeros((0,), np.float32) for _ in codes_list]
        t_max = max(lengths)
        if bucket:
            t_max = -(-t_max // bucket) * bucket
        batch = np.full((len(codes_list), t_max, nq), -1, np.int32)
        for i, c in enumerate(codes_list):
            batch[i, : c.shape[0]] = c[:, :nq]
        wav = codec_mod.chunked_decode(
            self.codec_params, dec_cfg, jnp.asarray(batch),
            decode_fn=self._codec_decode_jit,
        )
        wav = np.asarray(wav)
        up = self.cfg.codec.decode_upsample_rate
        return [wav[i, : lengths[i] * up] for i in range(len(codes_list))]

    def _generate(
        self,
        texts: List[str],
        speakers: List[Optional[str]],
        languages: List[str],
        instructs: Optional[List[Optional[str]]] = None,
        speaker_embeds: Optional[List[Optional[np.ndarray]]] = None,
        ref_ids: Optional[List[Optional[np.ndarray]]] = None,
        ref_codes: Optional[List[Optional[np.ndarray]]] = None,
        non_streaming: bool = False,
        **kwargs,
    ) -> Tuple[List[np.ndarray], int]:
        params = self._merge_params(**kwargs)
        prompts = []
        for i, text in enumerate(texts):
            ids = self._tokenize(self.build_assistant_text(text))
            instruct = instructs[i] if instructs else None
            instr_ids = (
                self._tokenize(self.build_instruct_text(instruct))
                if instruct
                else None
            )
            prompts.append(
                build_prompt(
                    self.talker_params,
                    self.cfg,
                    ids,
                    language=languages[i],
                    speaker=speakers[i],
                    speaker_embed=None if speaker_embeds is None else speaker_embeds[i],
                    instruct_ids=instr_ids,
                    non_streaming=non_streaming,
                    ref_ids=None if ref_ids is None else ref_ids[i],
                    ref_codes=None if ref_codes is None else ref_codes[i],
                    st_params=self.subtalker_params,
                )
            )
        codes, _ = self.generate_codes_from_prompts(prompts, params)
        if ref_codes is not None:
            # Voice clone: prepend ref codes before decode, cut the
            # proportional wav prefix after (qwen3_tts_model.py:612-631).
            merged, cut = [], []
            for i, c in enumerate(codes):
                if ref_codes[i] is not None:
                    rc = np.asarray(ref_codes[i], np.int32)
                    merged.append(np.concatenate([rc, c], axis=0))
                    cut.append(rc.shape[0])
                else:
                    merged.append(c)
                    cut.append(0)
            wavs = self.decode_codes(merged)
            up = self.cfg.codec.decode_upsample_rate
            wavs = [w[c * up :] for w, c in zip(wavs, cut)]
        else:
            wavs = self.decode_codes(codes)
        return wavs, self.sample_rate

    # ------------------------------------------------------------------
    # Public surface (reference: qwen3_tts_model.py:470-878)
    # ------------------------------------------------------------------

    def generate_custom_voice(
        self,
        text: MaybeList,
        speaker: MaybeList,
        language: MaybeList = "auto",
        instruct: Optional[MaybeList] = None,
        non_streaming_mode: bool = False,
        **kwargs,
    ) -> Tuple[List[np.ndarray], int]:
        """``non_streaming_mode`` feeds the whole text before codec_bos
        instead of trailing it in during decode
        (modeling_qwen3_tts.py:2030,2203-2227)."""
        texts = _as_list(text)
        speakers = _broadcast(_as_list(speaker), len(texts))
        languages = _broadcast(_as_list(language), len(texts))
        instructs = _broadcast(_as_list(instruct), len(texts)) if instruct else None
        if self.cfg.tts_model_size == "0.6b":
            instructs = None  # 0.6B drops instructions (qwen3_tts_model.py:799-800)
        self._validate(speakers, languages)
        return self._generate(texts, speakers, languages, instructs,
                              non_streaming=non_streaming_mode, **kwargs)

    def generate_voice_design(
        self,
        text: MaybeList,
        instruct: MaybeList,
        language: MaybeList = "auto",
        non_streaming_mode: bool = False,
        **kwargs,
    ) -> Tuple[List[np.ndarray], int]:
        texts = _as_list(text)
        instructs = _broadcast(_as_list(instruct), len(texts))
        languages = _broadcast(_as_list(language), len(texts))
        speakers = [None] * len(texts)
        self._validate(speakers, languages)
        return self._generate(texts, speakers, languages, instructs,
                              non_streaming=non_streaming_mode, **kwargs)

    def clone_prompt_inputs(
        self, voice_clone_prompt: Dict[str, Any], index: int = 0
    ) -> Tuple[Optional[np.ndarray], Optional[np.ndarray],
               Optional[np.ndarray]]:
        """One sample of a voice-clone prompt dict → the per-request
        ``(speaker_embed, ref_ids, ref_codes)`` triple that ``build_prompt``
        and the serving engines consume (ICL splice semantics from
        modeling_qwen3_tts.py:1968-2019; ref text gets the reference chat
        template via build_ref_text)."""
        p = voice_clone_prompt

        def col(name, default):
            v = p.get(name)
            if not v:
                return default
            if index >= len(v):
                raise ValueError(
                    f"voice_clone_prompt[{name!r}] has {len(v)} item(s); "
                    f"index {index} out of range"
                )
            return v[index]

        spk = col("ref_spk_embedding", None)
        icl = col("icl_mode", True)
        xvec_only = col("x_vector_only_mode", False)
        ref_code = col("ref_code", None)
        use_spk = xvec_only or icl
        speaker_embed = (np.asarray(spk)
                         if (use_spk and spk is not None) else None)
        if icl and ref_code is not None:
            ref_codes = np.asarray(ref_code, np.int32)
            ref_ids = self._tokenize(
                self.build_ref_text(col("ref_text", None) or "")
            )
            return speaker_embed, ref_ids, ref_codes
        return speaker_embed, None, None

    def generate_voice_clone(
        self,
        text: MaybeList,
        voice_clone_prompt: Optional[Any] = None,
        language: MaybeList = "auto",
        non_streaming_mode: bool = False,
        *,
        ref_audio=None,
        ref_text: Optional[MaybeList] = None,
        x_vector_only_mode: bool = False,
        **kwargs,
    ) -> Tuple[List[np.ndarray], int]:
        """``voice_clone_prompt`` accepts every form the reference takes
        (qwen3_tts_model.py:470-487): the dict layout from
        ``create_voice_clone_prompt`` (ref_code / ref_spk_embedding /
        ref_text / icl_mode / x_vector_only_mode lists), a single
        VoiceClonePromptItem-like object, or a list of them. Alternatively
        pass ``ref_audio`` (+ ``ref_text`` / ``x_vector_only_mode``) and the
        prompt is built inline (qwen3_tts_model.py:560-588)."""
        if voice_clone_prompt is None:
            if ref_audio is None:
                raise ValueError(
                    "provide voice_clone_prompt, or ref_audio (+ref_text)"
                )
            voice_clone_prompt = self.create_voice_clone_prompt(
                ref_audio, ref_text=ref_text,
                x_vector_only_mode=x_vector_only_mode,
            )
        else:
            from qwen_tts_tpu.voice_prompt import (
                normalize_voice_clone_prompt,
            )

            voice_clone_prompt = normalize_voice_clone_prompt(
                voice_clone_prompt
            )
        texts = _as_list(text)
        languages = _broadcast(_as_list(language), len(texts))
        n = len(texts)
        # A single prompt item broadcasts over all texts; otherwise lengths
        # must match (reference: qwen3_tts_model.py:570-586 repeats
        # prompt_items * len(texts) and errors on a mismatch).
        n_items = max(
            (len(v) for v in voice_clone_prompt.values() if v), default=0
        )
        if n_items == 1 and n > 1:
            voice_clone_prompt = {
                k: (list(v) * n if v else v)
                for k, v in voice_clone_prompt.items()
            }
        elif n_items not in (0, n):
            raise ValueError(
                f"voice_clone_prompt has {n_items} item(s) for {n} text(s) — "
                "pass one prompt item (broadcast) or exactly one per text"
            )

        speaker_embeds, ref_ids, ref_codes = [], [], []
        for i in range(n):
            se, ri, rc = self.clone_prompt_inputs(voice_clone_prompt, i)
            speaker_embeds.append(se)
            ref_ids.append(ri)
            ref_codes.append(rc)
        any_icl = any(c is not None for c in ref_codes)
        return self._generate(
            texts, [None] * n, languages,
            speaker_embeds=speaker_embeds,
            ref_ids=ref_ids if any_icl else None,
            ref_codes=ref_codes if any_icl else None,
            non_streaming=non_streaming_mode,
            **kwargs,
        )

    # ------------------------------------------------------------------
    # Dual-track streaming (BASELINE config #4)
    # ------------------------------------------------------------------

    def stream_custom_voice(
        self,
        text: str,
        speaker: Optional[str] = None,
        language: str = "auto",
        *,
        first_chunk_frames: int = 2,
        chunk_frames: int = 25,
        left_context_frames: int = 25,
        **kwargs,
    ):
        """Generator yielding (wav_chunk, sample_rate) as frames are decoded.

        The architecture is natively streaming (text trails into the decode on
        the second track, modeling_qwen3_tts.py:1682-1692); here the jitted
        loop runs in resumable segments — a small first segment for low
        first-packet latency, then steady chunks — and each segment's codes
        run through the codec decoder with ``left_context_frames`` of
        re-decoded context (the reference's chunked_decode pattern,
        modeling_...v2.py:886-896). KV cache and decode state stay on device
        between segments.
        """
        params = self._merge_params(**kwargs)
        ids = self._tokenize(self.build_assistant_text(text))
        prompt = build_prompt(
            self.talker_params, self.cfg, ids,
            language=language, speaker=speaker,
            st_params=self.subtalker_params,
        )
        yield from self.stream_from_prompt(
            prompt, params,
            first_chunk_frames=first_chunk_frames,
            chunk_frames=chunk_frames,
            left_context_frames=left_context_frames,
        )

    def stream_from_prompt(
        self,
        prompt: Prompt,
        params: GenerationParams,
        *,
        first_chunk_frames: int = 2,
        chunk_frames: int = 25,
        left_context_frames: int = 25,
        ref_codes: Optional[np.ndarray] = None,
    ):
        """``ref_codes`` (ICL voice clone) seed the codec code history as
        already-emitted frames: they condition every chunk's codec left
        context but their audio is never emitted — the streaming analog of
        the reference's ref-code prepend + wav cut
        (qwen3_tts_model.py:612-631), mirroring
        ContinuousBatchingEngine._admit."""
        if self.codec_params is None:
            raise RuntimeError("codec decoder weights not loaded")
        dec_cfg = self.cfg.codec.decoder
        nq = dec_cfg.num_quantizers
        up = self.cfg.codec.decode_upsample_rate
        dtype = self.talker_params["norm"].dtype

        embeds, mask, trailing, _ = batch_prompts([prompt], bucket=16)
        s = embeds.shape[1]
        trailing_j = jnp.asarray(trailing, dtype)
        step_limit = jnp.int32(params.max_new_tokens)
        first_segment = min(first_chunk_frames, params.max_new_tokens)
        # ONE dispatch from request to first audio: prefill + first segment +
        # codec decode fused (each dispatch over the tunnel costs ~20-25 ms).
        state, seg_codes, first_wav = _first_packet_program(
            self.talker_params, self.subtalker_params, self.codec_params,
            self.cfg.talker, dec_cfg,
            jnp.asarray(embeds, dtype), jnp.asarray(mask), trailing_j,
            sampling=params.talker_sampling(),
            st_sampling=params.subtalker_sampling(),
            max_cache_len=s + params.max_new_tokens,
            rng=jax.random.PRNGKey(params.seed),
            first_segment=first_segment,
            step_limit=step_limit,
            kv_int8=self.kv_int8,
        )

        if ref_codes is not None:
            history = np.asarray(ref_codes, np.int32)[:, :nq]
        else:
            history = np.zeros((0, nq), np.int32)
        ref_frames = history.shape[0]
        emitted = ref_frames
        prev_gen = 0
        first = True
        while True:
            if first:
                # One transfer for everything the host needs.
                num_gen_h, seg_h, wav_h = jax.device_get(
                    (state.num_gen, seg_codes, first_wav)
                )
            else:
                num_gen_h, seg_h = jax.device_get((state.num_gen, seg_codes))
            new_gen = int(num_gen_h[0])
            fresh = new_gen - prev_gen
            hit_budget = new_gen >= params.max_new_tokens
            # The EOS flag is only needed at stream end — fetching it every
            # chunk would add a blocking device round trip per chunk.
            stopped = (bool(np.asarray(state.eos).all())
                       if (hit_budget or fresh <= 0) else False)
            done = fresh <= 0 or stopped or hit_budget
            emit = fresh
            if done and hit_budget and not stopped:
                # Budget-exhausted rows drop their final frame: the reference
                # expands a step's groups lazily at the NEXT forward, which
                # never runs at max_new_tokens (modeling_qwen3_tts.py:
                # 2280-2291) — keeps stream == one-shot generate_codes.
                emit -= 1
            if emit > 0:
                history = np.concatenate(
                    [history, seg_h[0, :fresh, :nq]], axis=0
                )
                if first and ref_frames == 0:
                    # Audio came fused with the decode program.
                    wav = wav_h[0, : emit * up]
                else:
                    ctx = min(left_context_frames, emitted)
                    # Fixed-shape codec windows (right-padded): the decoder
                    # is fully causal, so trailing pad frames never affect
                    # the emitted region — two compiled codec programs total.
                    window_len = left_context_frames + chunk_frames
                    window = np.zeros((1, window_len, nq), np.int32)
                    window[0, : ctx + emit] = history[emitted - ctx : emitted + emit]
                    wav = np.asarray(
                        self._codec_decode_jit(self.codec_params, dec_cfg,
                                               jnp.asarray(window))
                    )[0, ctx * up : (ctx + emit) * up]
                emitted += emit
                prev_gen = new_gen
                first = False
                yield wav, self.sample_rate
            if done:
                break
            first = False
            state, seg_codes = decode_segment(
                self.talker_params, self.subtalker_params, self.cfg.talker,
                state, trailing_j,
                sampling=params.talker_sampling(),
                st_sampling=params.subtalker_sampling(),
                segment=chunk_frames, step_limit=step_limit,
            )

    def extract_speaker_embedding(self, audio: np.ndarray, sr: int) -> np.ndarray:
        """24 kHz mono waveform → 1024-d x-vector
        (modeling_qwen3_tts.py:1940-1954)."""
        if self.speaker_params is None:
            raise RuntimeError("this checkpoint has no speaker encoder (not a Base model)")
        if sr != self.cfg.speaker_encoder.sample_rate:
            raise ValueError(f"Only {self.cfg.speaker_encoder.sample_rate} Hz audio supported")
        from qwen_tts_tpu.models.speaker import mel_spectrogram, speaker_encoder_forward

        mels = mel_spectrogram(
            jnp.asarray(np.asarray(audio, np.float32)[None]),
            n_fft=1024, num_mels=self.cfg.speaker_encoder.mel_dim,
            sampling_rate=sr, hop_size=256, win_size=1024, fmin=0, fmax=12000,
        )
        xvec = speaker_encoder_forward(
            self.speaker_params, self.cfg.speaker_encoder, mels
        )
        return np.asarray(xvec)[0]

    def create_voice_clone_prompt(
        self,
        ref_audio,
        ref_text: Optional[MaybeList] = None,
        *,
        sample_rate: int = 24000,
        x_vector_only_mode: bool = False,
        icl_mode: bool = True,
    ) -> Dict[str, Any]:
        """Build a voice-clone prompt dict (reference layout,
        qwen3_tts_model.py:355-458): encode reference audio to codec codes via
        the 12 Hz encoder (ICL mode) and extract the ECAPA-TDNN x-vector.

        ``ref_audio`` accepts the reference's input forms
        (qwen3_tts_model.py:188-264): WAV path / http(s) URL / base64 string,
        an ``(np.ndarray, sr)`` tuple, a bare ndarray (requires
        ``sample_rate``), or a list of those. Non-24k audio is resampled with
        the polyphase windowed-sinc resampler (qwen_tts_tpu/audio.py)."""
        from qwen_tts_tpu.audio import normalize_audio_inputs, resample

        raw = ref_audio if isinstance(ref_audio, list) else [ref_audio]
        if sample_rate is not None:
            raw = [(np.asarray(a, np.float32), sample_rate)
                   if isinstance(a, np.ndarray) else a for a in raw]
        pairs = normalize_audio_inputs(raw)
        audios = [resample(w, sr, 24000) for w, sr in pairs]
        sample_rate = 24000
        n = len(audios)
        ref_texts = _broadcast(_as_list(ref_text), n) if ref_text else [None] * n

        use_icl = icl_mode and not x_vector_only_mode
        if use_icl:
            ref_codes = self.speech_encoder.encode(audios, sample_rate)
        else:
            ref_codes = [None] * n
        spk = [
            self.extract_speaker_embedding(a, sample_rate) for a in audios
        ] if self.speaker_params is not None else [None] * n
        return {
            "ref_code": ref_codes,
            "ref_spk_embedding": spk,
            "ref_text": ref_texts,
            "icl_mode": [use_icl] * n,
            "x_vector_only_mode": [not use_icl] * n,
        }

    @staticmethod
    def save_voice_clone_prompt(prompt: Dict[str, Any], path: str) -> str:
        """Persist a voice-clone prompt as a reusable voice file
        (reference demo's Save Voice flow, cli/demo.py:501-524; ``.pt``
        torch payload for interop, or ``.npz`` for torch-free use)."""
        from qwen_tts_tpu.voice_prompt import save_voice_clone_prompt

        return save_voice_clone_prompt(prompt, path)

    @staticmethod
    def load_voice_clone_prompt(path: str) -> Dict[str, Any]:
        """Load a voice file written by :meth:`save_voice_clone_prompt` or
        by the reference demo (cli/demo.py:526-583)."""
        from qwen_tts_tpu.voice_prompt import load_voice_clone_prompt

        return load_voice_clone_prompt(path)

    def _validate(self, speakers, languages):
        sup_l = set(self.get_supported_languages())
        for lang in languages:
            if lang and lang.lower() not in sup_l:
                raise NotImplementedError(f"Language {lang} not implemented")
        sup_s = set(self.get_supported_speakers())
        for spk in speakers:
            if spk and spk.lower() not in sup_s:
                raise NotImplementedError(f"Speaker {spk} not implemented")


def _as_list(x) -> List:
    return x if isinstance(x, list) else [x]


def _broadcast(xs: List, n: int) -> List:
    if len(xs) == 1 and n > 1:
        return xs * n
    if len(xs) != n:
        raise ValueError(f"length mismatch: {len(xs)} vs {n}")
    return xs
