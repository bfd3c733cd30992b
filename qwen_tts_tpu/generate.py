"""End-to-end generation: prompt-schema construction + the jitted
autoregressive decode loop.

Prompt schema replicates modeling_qwen3_tts.py:2124-2233 exactly (SURVEY.md §0
"prefix construction"): dual-track fusion where every position is the sum of a
text-track embedding (projected) and a codec-track embedding.

The decode loop is the TPU-first rework of the reference's nested HF
``generate`` calls (modeling_qwen3_tts.py:1664-1744): **one**
``lax.while_loop`` jitted once per (batch, prefill-bucket, max-new) shape —
each iteration runs the sub-talker micro-decode scan, the group-embedding sum,
the talker single-token forward, logits processing and sampling entirely
on-device. No host round-trips inside the loop; EOS is tracked per row and the
loop exits when every row has stopped.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qwen_tts_tpu.config import TalkerConfig, TTSConfig
from qwen_tts_tpu.models import subtalker as st_mod
from qwen_tts_tpu.models import talker as talker_mod
from qwen_tts_tpu.ops.sampling import (
    SamplingConfig,
    apply_repetition_penalty,
    apply_suppress_mask,
    build_suppress_mask,
    sample_token,
)
from qwen_tts_tpu.ops.sampling_vec import (
    VecSampling,
    apply_repetition_penalty_vec,
    sample_token_vec,
)


@dataclasses.dataclass(frozen=True)
class GenerationParams:
    """Generation controls; defaults mirror the reference's hard defaults
    (inference/qwen3_tts_model.py:319-330, modeling_qwen3_tts.py:2044-2058)."""

    max_new_tokens: int = 2048
    do_sample: bool = True
    top_k: int = 50
    top_p: float = 1.0
    temperature: float = 0.9
    repetition_penalty: float = 1.05
    min_new_tokens: int = 2
    subtalker_do_sample: bool = True
    subtalker_top_k: int = 50
    subtalker_top_p: float = 1.0
    subtalker_temperature: float = 0.9
    seed: int = 0

    def talker_sampling(self) -> SamplingConfig:
        return SamplingConfig(
            do_sample=self.do_sample,
            temperature=self.temperature,
            top_k=self.top_k,
            top_p=self.top_p,
            repetition_penalty=self.repetition_penalty,
            min_new_tokens=self.min_new_tokens,
        )

    def subtalker_sampling(self) -> SamplingConfig:
        return SamplingConfig(
            do_sample=self.subtalker_do_sample,
            temperature=self.subtalker_temperature,
            top_k=self.subtalker_top_k,
            top_p=self.subtalker_top_p,
        )

    def greedy(self) -> "GenerationParams":
        return dataclasses.replace(
            self, do_sample=False, subtalker_do_sample=False,
            repetition_penalty=1.0, min_new_tokens=0,
        )


# --------------------------------------------------------------------------
# Prompt schema
# --------------------------------------------------------------------------

class Prompt(NamedTuple):
    """One utterance's prefix on both tracks (unbatched, numpy-backed)."""

    embeds: np.ndarray          # [S, D] summed dual-track prefix embeddings
    trailing_text: np.ndarray   # [T_tr, D] trailing text-track embeddings
    tts_pad_embed: np.ndarray   # [D]


def build_prompt(
    params: dict,
    cfg: TTSConfig,
    text_ids: Sequence[int],
    *,
    language: str = "auto",
    speaker: Optional[str] = None,
    speaker_embed: Optional[np.ndarray] = None,  # x-vector slot (Base models)
    instruct_ids: Optional[Sequence[int]] = None,
    non_streaming: bool = False,
    ref_ids: Optional[Sequence[int]] = None,      # ICL voice clone
    ref_codes: Optional[np.ndarray] = None,       # [T_ref, G]
    st_params: Optional[dict] = None,             # needed for ICL ref-code embeds
) -> Prompt:
    """Build the dual-track prefix for one utterance.

    ``text_ids`` is the full chat-templated id sequence
    ``[im_start, assistant, \\n, TEXT..., im_end, \\n, im_start, assistant, \\n]``
    — positions [0:3] are the role header, [3:-5] the content
    (modeling_qwen3_tts.py:2174-2232; C equivalent c/qwen_tts.c:1147-1243).
    """
    tk = cfg.talker
    text_ids = np.asarray(text_ids, np.int32)
    if text_ids.ndim != 1 or text_ids.shape[0] < 8:
        raise ValueError("need the full chat-templated id sequence (>= 8 ids)")

    def etext(ids) -> jnp.ndarray:
        return talker_mod.embed_text(params, jnp.asarray(np.atleast_1d(ids)))

    def ecodec(ids) -> jnp.ndarray:
        return talker_mod.embed_codec(params, jnp.asarray(np.atleast_1d(ids)))

    tts_bos, tts_eos, tts_pad = (
        np.asarray(
            etext([cfg.tts_bos_token_id, cfg.tts_eos_token_id, cfg.tts_pad_token_id])
        )
    )

    # --- speaker slot -----------------------------------------------------
    spk_vec: Optional[np.ndarray] = None
    if speaker_embed is not None:
        spk_vec = np.asarray(speaker_embed, np.float32)
    elif speaker:
        sid = tk.speaker_codec_id(speaker)
        if sid is None:
            raise ValueError(f"Speaker {speaker!r} not supported")
        spk_vec = np.asarray(ecodec([sid]))[0]

    # --- language id (incl. dialect override, modeling_qwen3_tts.py:2118-2122)
    language = (language or "auto").lower()
    if language == "auto":
        language_id = None
    else:
        language_id = tk.language_codec_id(language)
        if language_id is None:
            raise ValueError(f"Language {language!r} not supported")
    if language in ("chinese", "auto") and speaker:
        dialect = tk.speaker_dialect(speaker)
        if dialect:
            language_id = tk.language_codec_id(dialect)

    # --- codec-track prefix ----------------------------------------------
    if language_id is None:
        codec_ids = [tk.codec_nothink_id, tk.codec_think_bos_id, tk.codec_think_eos_id]
    else:
        codec_ids = [tk.codec_think_id, tk.codec_think_bos_id, language_id,
                     tk.codec_think_eos_id]
    codec_embeds = [np.asarray(ecodec(codec_ids))]
    if spk_vec is not None:
        codec_embeds.append(spk_vec[None])
    codec_embeds.append(np.asarray(ecodec([tk.codec_pad_id, tk.codec_bos_id])))
    codec_prefix = np.concatenate(codec_embeds, axis=0)  # [n_codec, D]
    n_codec = codec_prefix.shape[0]

    pieces: List[np.ndarray] = []
    if instruct_ids is not None and len(instruct_ids) > 0:
        pieces.append(np.asarray(etext(np.asarray(instruct_ids, np.int32))))

    # role header (3 tokens, text track only)
    pieces.append(np.asarray(etext(text_ids[:3])))

    # tts_pad × (n_codec - 2) + tts_bos on the text track, summed with the
    # codec prefix sans its last token (codec_bos).
    text_track = np.concatenate(
        [np.repeat(tts_pad[None], n_codec - 2, axis=0), tts_bos[None]], axis=0
    )
    pieces.append(text_track + codec_prefix[:-1])

    if ref_codes is not None:
        # ICL voice clone splice (modeling_qwen3_tts.py:1968-2019).
        if st_params is None:
            raise ValueError("ICL prompts need st_params for ref-code embeddings")
        icl, trailing = _build_icl(
            params, st_params, cfg, text_ids, np.asarray(ref_ids, np.int32),
            np.asarray(ref_codes, np.int64), tts_pad, tts_eos, non_streaming,
        )
        pieces.append(icl)
        embeds = np.concatenate(pieces, axis=0)
        return Prompt(embeds, trailing, tts_pad)

    if non_streaming:
        # Whole text + tts_eos on the text track, each summed with codec_pad;
        # then tts_pad + codec_bos (modeling_qwen3_tts.py:2203-2227).
        content = np.asarray(etext(text_ids[3:-5]))
        codec_pad = np.asarray(ecodec([tk.codec_pad_id]))[0]
        codec_bos = codec_prefix[-1]
        block = np.concatenate([content, tts_eos[None]], axis=0) + codec_pad[None]
        pieces.append(block)
        pieces.append((tts_pad + codec_bos)[None])
        trailing = tts_pad[None]
    else:
        # First content token + codec_bos; the rest of the text trails in
        # during decode (modeling_qwen3_tts.py:2199-2232).
        first_text = np.asarray(etext(text_ids[3:4]))
        pieces.append(first_text + codec_prefix[-1:])
        trailing = np.concatenate(
            [np.asarray(etext(text_ids[4:-5])), tts_eos[None]], axis=0
        )
    embeds = np.concatenate(pieces, axis=0)
    return Prompt(embeds, trailing, tts_pad)


def _build_icl(
    params: dict,
    st_params: dict,
    cfg: TTSConfig,
    text_ids: np.ndarray,
    ref_ids: np.ndarray,
    ref_codes: np.ndarray,
    tts_pad: np.ndarray,
    tts_eos: np.ndarray,
    non_streaming: bool,
) -> Tuple[np.ndarray, np.ndarray]:
    """ICL voice-clone prefix: ref text ⊕ ref codec Σ-embeddings
    (modeling_qwen3_tts.py:1968-2019). Returns (icl_embeds, trailing_text)."""
    tk = cfg.talker
    text_embed = np.asarray(
        talker_mod.embed_text(
            params,
            jnp.asarray(np.concatenate([ref_ids[3:-2], text_ids[3:-5]])),
        )
    )
    text_embed = np.concatenate([text_embed, tts_eos[None]], axis=0)

    sums = np.asarray(
        st_mod.embed_groups_sum(
            st_params,
            params["codec_embedding"],
            jnp.asarray(ref_codes),
        )
    )
    codec_bos = np.asarray(
        talker_mod.embed_codec(params, jnp.asarray([tk.codec_bos_id]))
    )
    codec_embed = np.concatenate([codec_bos, sums], axis=0)

    text_lens, codec_lens = text_embed.shape[0], codec_embed.shape[0]
    if non_streaming:
        codec_pad = np.asarray(
            talker_mod.embed_codec(params, jnp.asarray([tk.codec_pad_id]))
        )[0]
        icl = np.concatenate(
            [text_embed + codec_pad[None], codec_embed + tts_pad[None]], axis=0
        )
        return icl, tts_pad[None]
    if text_lens > codec_lens:
        return text_embed[:codec_lens] + codec_embed, text_embed[codec_lens:]
    padded = np.concatenate(
        [text_embed, np.repeat(tts_pad[None], codec_lens - text_lens, axis=0)], axis=0
    )
    return padded + codec_embed, tts_pad[None]


def batch_prompts(
    prompts: Sequence[Prompt], bucket: int = 32,
    trailing_bucket: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Left-pad prompts into a batch (modeling_qwen3_tts.py:2239-2269).

    Returns (embeds [B,S,D], pad_mask [B,S], trailing [B,T+1,D], lengths [B]).
    S is rounded up to ``bucket`` so the prefill jit-cache stays small;
    ``trailing_bucket`` rounds the trailing-text axis the same way (pad rows
    are tts_pad, which is exactly what the decode consumes past each row's
    text — bucketing is semantics-free).
    """
    lengths = np.array([p.embeds.shape[0] for p in prompts])
    s = int(np.ceil(lengths.max() / bucket) * bucket)
    d = prompts[0].embeds.shape[1]
    b = len(prompts)
    embeds = np.zeros((b, s, d), prompts[0].embeds.dtype)
    mask = np.zeros((b, s), bool)
    for i, p in enumerate(prompts):
        n = p.embeds.shape[0]
        embeds[i, s - n :] = p.embeds
        mask[i, s - n :] = True

    t_max = max(p.trailing_text.shape[0] for p in prompts)
    if trailing_bucket:
        t_max = -(-t_max // trailing_bucket) * trailing_bucket
    trailing = np.zeros((b, t_max + 1, d), prompts[0].trailing_text.dtype)
    for i, p in enumerate(prompts):
        n = p.trailing_text.shape[0]
        trailing[i, :n] = p.trailing_text
        trailing[i, n:] = p.tts_pad_embed  # pad rows = tts_pad (reference :2256-2268)
    return embeds, mask, trailing, lengths


# --------------------------------------------------------------------------
# Jitted decode loop (batch + resumable streaming segments)
# --------------------------------------------------------------------------

class GenOutput(NamedTuple):
    codes: jnp.ndarray     # [B, max_new, G] int32
    num_gen: jnp.ndarray   # [B] frames generated before EOS
    stopped: jnp.ndarray   # [B] bool — True if EOS was seen


class DecodeState(NamedTuple):
    """Carried decode-loop state — device-resident between streaming segments
    so resuming costs no host transfer.

    All per-row fields are independent per slot: ``num_gen`` is each row's
    frame counter and cache positions derive from ``prefix_len + num_gen``, so
    slots at different sequence positions decode in the same program
    (continuous batching)."""

    tick: jnp.ndarray       # scalar int32 — loop iterations (rng/segment bookkeeping)
    token: jnp.ndarray      # [B] current codebook-0 token
    hidden: jnp.ndarray     # [B, D] talker post-norm hidden
    k_cache: jnp.ndarray    # [L, B, S_max, KV, hd]
    v_cache: jnp.ndarray
    presence: jnp.ndarray   # [B, V] repetition-penalty history
    eos: jnp.ndarray        # [B]
    num_gen: jnp.ndarray    # [B] per-row frames generated (the row's "step")
    prefix_len: jnp.ndarray # [B] prefill length (cache slots used by the prefix)
    n_real: jnp.ndarray     # [B] unpadded prefix lengths
    valid_from: jnp.ndarray # [B] left-pad counts
    rng: jax.Array


def _processor(talker_cfg: TalkerConfig, sampling: SamplingConfig,
               vec_sampling: "Optional[VecSampling]" = None):
    """Logits pipeline: suppress → min-new-tokens EOS ban → repetition
    penalty → sample. With ``vec_sampling`` every control is per-row
    (continuous batching serves heterogeneous requests in one program)."""
    vocab = talker_cfg.vocab_size
    eos_id = talker_cfg.codec_eos_token_id
    suppress = build_suppress_mask(vocab, eos_id, tail=talker_cfg.suppress_tail)

    def process_and_sample(logits, presence, num_sampled, step_rng):
        logits = apply_suppress_mask(logits, suppress[None])
        if vec_sampling is not None:
            ban = num_sampled < vec_sampling.min_new_tokens   # [B]
            logits = jnp.where(
                ban[:, None] & (jnp.arange(vocab)[None] == eos_id), -1e9, logits
            )
            logits = apply_repetition_penalty_vec(
                logits, presence, vec_sampling.repetition_penalty
            )
            return sample_token_vec(logits, vec_sampling, step_rng)
        if sampling.min_new_tokens > 0:
            ban = num_sampled < sampling.min_new_tokens      # [B]
            logits = jnp.where(
                ban[:, None] & (jnp.arange(vocab)[None] == eos_id), -1e9, logits
            )
        logits = apply_repetition_penalty(logits, presence, sampling.repetition_penalty)
        return sample_token(logits, sampling, step_rng)

    return process_and_sample


def _frame_body(
    talker_params: dict,
    st_params: dict,
    talker_cfg: TalkerConfig,
    sampling: SamplingConfig,
    st_sampling: SamplingConfig,
    trailing: jnp.ndarray,
    step_limit: jnp.ndarray,   # [B] or scalar — per-row frame budget
    dtype,
    vec_sampling: "Optional[VecSampling]" = None,
    st_vec_sampling: "Optional[VecSampling]" = None,
):
    """One frame of the AR loop: sub-talker scan → Σ-embed + trailing →
    talker step → sample. Shared by the one-shot batch loop, the streaming
    segments, and the continuous-batching engine. All positions are per-row
    (``num_gen``-derived), so slots may be at different depths."""
    eos_id = talker_cfg.codec_eos_token_id
    trailing_max = trailing.shape[1] - 1
    process_and_sample = _processor(talker_cfg, sampling, vec_sampling)

    def body(st: DecodeState) -> Tuple[DecodeState, jnp.ndarray]:
        b = st.token.shape[0]
        rows = jnp.arange(b)
        rng = jax.random.fold_in(st.rng, st.tick)
        r_sub, r_tok = jax.random.split(rng)
        limit_b = jnp.broadcast_to(jnp.asarray(step_limit), (b,))
        active = ~st.eos & (st.num_gen < limit_b)

        # 1) sub-talker expands the current token into all groups.
        import os as _os

        use_jacobi = bool(int(_os.environ.get("QTTS_ST_JACOBI", "0")))
        if use_jacobi:
            # Exact fixed-point iteration (greedy, sampled, or per-row vec
            # sampled — all via the gumbel-max key-reuse trick): trunk
            # weights stream once per iteration instead of once per
            # micro-step (see subtalker_generate_jacobi's contract).
            _fi = _os.environ.get("QTTS_ST_JACOBI_ITERS")
            frame = st_mod.subtalker_generate_jacobi(
                st_params, talker_cfg.code_predictor,
                talker_params["codec_embedding"], st.hidden, st.token,
                sampling=st_sampling, rng=r_sub,
                vec_sampling=st_vec_sampling,
                fixed_iters=int(_fi) if _fi else None,
            )  # [B, G]
        else:
            frame = st_mod.subtalker_generate(
                st_params, talker_cfg.code_predictor,
                talker_params["codec_embedding"], st.hidden, st.token,
                st_sampling, r_sub, vec_sampling=st_vec_sampling,
            )  # [B, G]
        num_gen = st.num_gen + active.astype(jnp.int32)

        # 2) next talker input: Σ group embeddings + trailing text / tts_pad.
        emb = st_mod.embed_groups_sum(
            st_params, talker_params["codec_embedding"], frame
        )
        t_idx = jnp.minimum(st.num_gen, trailing_max)
        emb = emb + trailing[rows, t_idx]

        # 3) talker forward — per-row cache position and rope position.
        #    Inactive rows rewrite their current slot (masked out, harmless).
        cur_len = st.prefix_len + st.num_gen + 1
        rope_pos = st.n_real + st.num_gen
        logits, hidden, kc, vc = talker_mod.talker_decode_step(
            talker_params, talker_cfg, emb.astype(dtype),
            rope_pos, st.k_cache, st.v_cache, cur_len, st.valid_from,
        )

        # 4) sample the next codebook-0 token.
        token = process_and_sample(logits, st.presence, st.num_gen + 1, r_tok)
        token = jnp.where(active, token, st.token)
        presence = st.presence.at[rows, token].set(True)
        eos = st.eos | (token == eos_id)
        hidden = jnp.where(active[:, None], hidden, st.hidden)

        new_state = DecodeState(
            tick=st.tick + 1, token=token, hidden=hidden,
            k_cache=kc, v_cache=vc, presence=presence, eos=eos,
            num_gen=num_gen, prefix_len=st.prefix_len,
            n_real=st.n_real, valid_from=st.valid_from,
            rng=st.rng,
        )
        return new_state, frame

    return body


def _segment_loop(body, state: DecodeState, segment: int, step_limit, g: int):
    """Shared bounded loop: run up to ``segment`` ticks, collecting frames
    into a [B, segment, G] buffer (row b's valid rows are its num_gen delta).
    Exits early once every row is done (EOS or its per-row ``step_limit``)."""
    b = state.token.shape[0]
    start = state.tick
    limit_b = jnp.broadcast_to(jnp.asarray(step_limit), (b,))

    def cond(carry):
        st, _ = carry
        any_active = jnp.any(~st.eos & (st.num_gen < limit_b))
        return (st.tick - start < segment) & any_active

    def loop_body(carry):
        st, buf = carry
        st2, frame = body(st)
        buf = jax.lax.dynamic_update_slice(
            buf, frame[:, None, :], (0, st.tick - start, 0)
        )
        return st2, buf

    seg_buf = jnp.zeros((b, segment, g), jnp.int32)
    return jax.lax.while_loop(cond, loop_body, (state, seg_buf))


@partial(
    jax.jit,
    static_argnames=("talker_cfg", "sampling", "st_sampling", "max_cache_len",
                     "first_segment", "kv_int8", "st_env"),
)
def _init_decode_jit(
    talker_params: dict,
    st_params: dict,
    talker_cfg: TalkerConfig,
    inputs_embeds: jnp.ndarray,   # [B, S, D] left-padded prefix
    pad_mask: jnp.ndarray,        # [B, S]
    *,
    sampling: SamplingConfig,
    max_cache_len: int,
    rng: jax.Array,
    st_sampling: Optional[SamplingConfig] = None,
    first_segment: int = 0,
    trailing: Optional[jnp.ndarray] = None,
    step_limit: Optional[jnp.ndarray] = None,
    vec_sampling: Optional[VecSampling] = None,
    st_vec_sampling: Optional[VecSampling] = None,
    kv_int8: bool = False,
    st_env: tuple = (),
):
    """Prefill + first-token sample; returns the carried decode state.

    With ``first_segment > 0`` (requires ``trailing``/``st_sampling``), the
    first frames run inside the same program — one device dispatch from
    request to first codes, which is what bounds first-packet latency.

    ``vec_sampling``/``st_vec_sampling`` make every control per-row from the
    very first token (continuous batching admits requests through here, so
    token 0 must honor the request's own do_sample/min_new_tokens — not
    whatever config the engine was compiled with)."""
    b, s, _ = inputs_embeds.shape
    cache_dtype = talker_params["norm"].dtype
    k_cache, v_cache = talker_mod.alloc_kv_cache(
        talker_cfg, b, max_cache_len, cache_dtype, kv_int8=kv_int8
    )
    pre = talker_mod.talker_prefill(
        talker_params, talker_cfg, inputs_embeds, pad_mask, k_cache, v_cache
    )
    n_real = jnp.sum(pad_mask.astype(jnp.int32), axis=-1)
    valid_from = (s - n_real).astype(jnp.int32)

    process_and_sample = _processor(talker_cfg, sampling, vec_sampling)
    rng, r0 = jax.random.split(rng)
    presence = jnp.zeros((b, talker_cfg.vocab_size), bool)
    token0 = process_and_sample(
        pre.logits, presence, jnp.zeros((b,), jnp.int32), r0
    )
    presence = presence.at[jnp.arange(b), token0].set(True)
    state = DecodeState(
        tick=jnp.int32(0),
        token=token0,
        hidden=pre.last_hidden,
        k_cache=pre.k_cache,
        v_cache=pre.v_cache,
        presence=presence,
        eos=token0 == talker_cfg.codec_eos_token_id,
        num_gen=jnp.zeros((b,), jnp.int32),
        prefix_len=jnp.full((b,), s, jnp.int32),
        n_real=n_real,
        valid_from=valid_from,
        rng=rng,
    )
    if first_segment <= 0:
        return state
    if step_limit is None:
        step_limit = jnp.int32(first_segment)
    body = _frame_body(
        talker_params, st_params, talker_cfg, sampling, st_sampling,
        trailing, step_limit, talker_params["norm"].dtype,
        vec_sampling=vec_sampling, st_vec_sampling=st_vec_sampling,
    )
    return _segment_loop(body, state, first_segment, step_limit,
                         talker_cfg.num_code_groups)


def init_decode(*args, **kwargs):
    """Public entry for :func:`_init_decode_jit`.

    Injects the QTTS_ST_* env-gate snapshot as a static cache key: the gates
    (Jacobi / split / unroll / kv8) are read at *trace* time inside the
    program body, so without this a same-shape call after an env flip would
    silently re-execute the stale cached program (the HLO is unchanged when
    the env is unchanged, so the persistent compile cache is unaffected)."""
    kwargs.setdefault("st_env", st_mod.st_env_token())
    return _init_decode_jit(*args, **kwargs)


@partial(
    jax.jit,
    static_argnames=("talker_cfg", "sampling", "st_sampling", "segment",
                     "st_env", "with_report"),
    donate_argnames=("state",),
)
def _decode_segment_jit(
    talker_params: dict,
    st_params: dict,
    talker_cfg: TalkerConfig,
    state: DecodeState,
    trailing: jnp.ndarray,
    *,
    sampling: SamplingConfig,
    st_sampling: SamplingConfig,
    segment: int,
    step_limit: Optional[jnp.ndarray] = None,
    vec_sampling: Optional[VecSampling] = None,
    st_vec_sampling: Optional[VecSampling] = None,
    st_env: tuple = (),
    with_report: bool = False,
) -> Tuple[DecodeState, jnp.ndarray]:
    """Run up to ``segment`` frames, resumable. Returns (state, seg_codes
    [B, segment, G]); valid rows/frames are derivable from num_gen deltas.
    This is the dual-track streaming engine: codes stream out per segment
    while the KV cache stays device-resident.

    ``step_limit`` is a *dynamic* per-row (or scalar) cap on each row's total
    frames (max_new_tokens) so a trailing partial segment reuses the compiled
    steady-segment program instead of triggering a new shape.

    ``with_report=True`` appends a third output ``(num_gen + 1, ~eos)`` in
    buffers guaranteed to SURVIVE donating the returned state into the next
    segment's dispatch (the double-buffered engine fetches segment K's
    results after dispatching K+1; ``state`` is donated, so reading
    ``state.num_gen`` then would hit deleted/reused buffers). The values are
    bias-encoded (+1 / logical-not) so XLA can neither CSE them onto the
    state outputs nor alias them into the donated input buffers — a plain
    copy could legally share the output allocation. Callers decode with
    ``report[0] - 1`` / ``~report[1]``."""
    dtype = talker_params["norm"].dtype
    if step_limit is None:
        step_limit = state.num_gen + segment
    body = _frame_body(
        talker_params, st_params, talker_cfg, sampling, st_sampling,
        trailing, step_limit, dtype, vec_sampling=vec_sampling,
        st_vec_sampling=st_vec_sampling,
    )
    new_state, seg_codes = _segment_loop(body, state, segment, step_limit,
                                         talker_cfg.num_code_groups)
    if not with_report:
        return new_state, seg_codes
    return new_state, seg_codes, (new_state.num_gen + 1,
                                  jnp.logical_not(new_state.eos))


def decode_segment(*args, **kwargs):
    """Public entry for :func:`_decode_segment_jit`; see :func:`init_decode`
    for why the env-gate snapshot rides along as a static cache key."""
    kwargs.setdefault("st_env", st_mod.st_env_token())
    return _decode_segment_jit(*args, **kwargs)


def generate_codes(
    talker_params: dict,
    st_params: dict,
    talker_cfg: TalkerConfig,
    inputs_embeds: jnp.ndarray,   # [B, S, D] left-padded prefix
    pad_mask: jnp.ndarray,        # [B, S]
    trailing: jnp.ndarray,        # [B, T+1, D] padded trailing text
    *,
    sampling: SamplingConfig,
    st_sampling: SamplingConfig,
    max_new_tokens: int,
    rng: jax.Array,
    trim_last_on_budget: bool = True,
    kv_int8: bool = False,
    step_limit: Optional[jnp.ndarray] = None,
) -> GenOutput:
    """Prefill + full AR loop — ONE device program (fused init + segment).

    ``trim_last_on_budget=False`` keeps all ``max_new_tokens`` frames on
    budget-exhausted rows (the C engine's --fixed-codec-tokens benchmark
    semantics, c/main.c:48; the Python reference drops the unexpanded final
    frame — see below).

    ``step_limit`` (scalar or per-row [B], ≤ max_new_tokens) is a DYNAMIC
    frame budget: the program compiles once at the ``max_new_tokens`` ceiling
    and serves any smaller per-request budget without a new XLA compile (the
    serving engines decode heterogeneous max_new requests through one
    program this way)."""
    s = inputs_embeds.shape[1]
    state, codes = init_decode(
        talker_params, st_params, talker_cfg, inputs_embeds, pad_mask,
        sampling=sampling, st_sampling=st_sampling,
        max_cache_len=s + max_new_tokens, rng=rng,
        first_segment=max_new_tokens, trailing=trailing, kv_int8=kv_int8,
        step_limit=(None if step_limit is None
                    else jnp.asarray(step_limit, jnp.int32)),
    )
    # Budget-exhausted rows lose their final frame: the reference expands a
    # step's code groups lazily at the NEXT talker forward, so when generation
    # stops at max_new_tokens the last cb0 token is never expanded and only
    # max_new-1 frames reach the codec (modeling_qwen3_tts.py:2280-2291 —
    # hidden_states carry one frame per *forward*, prefill excluded).
    num_gen = state.num_gen
    if trim_last_on_budget:
        limit = (jnp.int32(max_new_tokens) if step_limit is None
                 else jnp.asarray(step_limit, jnp.int32))
        # max(0, …): a per-row step_limit of 0 must yield an empty row, not
        # num_gen == -1 (callers slice codes[i, :num_gen[i]], and -1 would
        # keep nearly all frames).
        num_gen = jnp.where(
            state.eos, num_gen,
            jnp.maximum(jnp.minimum(num_gen, limit - 1), 0),
        )
    return GenOutput(codes, num_gen, state.eos)
