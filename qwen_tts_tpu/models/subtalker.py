"""Sub-Talker ("code predictor"): expands each talker step into the remaining
codebook groups.

Reference semantics (modeling_qwen3_tts.py:1015-1319, c/qwen_tts_talker.c:539-736):
a 33-position-max sequential micro-decode per frame —

* position 0: the talker's post-norm last hidden state
* position 1: talker codec embedding of the frame's codebook-0 token;
  its output goes through ``lm_head[0]`` → group-1 token
* position k >= 2: ``codec_embedding[k-2]`` of the previous group's token;
  output through ``lm_head[k-1]`` → group-k token

All inputs pass through ``small_to_mtp_projection`` (identity when dims match,
modeling_qwen3_tts.py:1171-1174). Standard 1D RoPE, same QK-norm trunk.

TPU-first design (SURVEY.md §7 step 3): the 31 embedding tables and 31 LM
heads are **stacked tensors** ([G-1, V, D] / [G-1, D, V]) indexed by step, so
the whole micro-decode is one ``lax.scan`` — a single compiled step body, no
per-group Python loop, per-step table selection is a ``dynamic_index`` gather.
The tiny KV cache ([L, B, G, KV, hd]) lives in the scan carry and stays
on-chip.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from qwen_tts_tpu.config import CodePredictorConfig
from qwen_tts_tpu.models.trunk import (
    TrunkDims,
    init_trunk_params,
    trunk_decode_step,
)
from qwen_tts_tpu.ops.norms import rms_norm
from qwen_tts_tpu.ops.rope import rope_cos_sin
from qwen_tts_tpu.ops.sampling import SamplingConfig, sample_token

# Env gates read at TRACE time inside the decode-path program bodies. Any
# jitted entry whose trace consumes them must include st_env_token() in its
# static cache key, or a same-shape call after an env flip re-executes the
# stale cached program (jit caches do not key on os.environ).
_ST_ENV_KEYS = (
    "QTTS_ST_JACOBI",
    "QTTS_ST_JACOBI_ITERS",
    "QTTS_ST_SPLIT",
    "QTTS_ST_KV8",
    "QTTS_ST_UNROLL",
    "QTTS_ST_UNROLL_LAYERS",
)


def st_env_token() -> tuple:
    """Hashable snapshot of the sub-talker decode env gates (a jit cache key)."""
    import os

    return tuple(os.environ.get(k) for k in _ST_ENV_KEYS)


def subtalker_dims(cfg: CodePredictorConfig) -> TrunkDims:
    return TrunkDims(
        num_layers=cfg.num_hidden_layers,
        hidden=cfg.hidden_size,
        heads=cfg.num_attention_heads,
        kv_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        intermediate=cfg.intermediate_size,
        eps=cfg.rms_norm_eps,
        qk_norm=True,
    )


def init_subtalker_params(
    rng: jax.Array,
    cfg: CodePredictorConfig,
    talker_hidden: int,
    dtype=jnp.float32,
) -> dict:
    keys = jax.random.split(rng, 5)
    g1 = cfg.num_code_groups - 1

    def w(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) / jnp.sqrt(fan_in)).astype(dtype)

    params = {
        # 31 embedding tables; embedding_dim is the *talker* hidden size
        # (modeling_qwen3_tts.py:1030-1032 — embeddings feed both the
        # micro-decode and the talker's next-frame input sum).
        "embeds": w(keys[0], (g1, cfg.vocab_size, talker_hidden), talker_hidden),
        "trunk": init_trunk_params(keys[1], subtalker_dims(cfg), dtype),
        "norm": jnp.ones((cfg.hidden_size,), dtype),
        "lm_heads": w(keys[2], (g1, cfg.hidden_size, cfg.vocab_size), cfg.hidden_size),
    }
    if cfg.hidden_size != talker_hidden:
        params["input_proj"] = w(keys[3], (talker_hidden, cfg.hidden_size), talker_hidden)
        params["input_proj_b"] = jnp.zeros((cfg.hidden_size,), dtype)
    return params


def _project_input(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """small_to_mtp_projection (identity when dims match)."""
    if "input_proj" in params:
        return x @ params["input_proj"] + params["input_proj_b"]
    return x


def quantize_subtalker_tables_int8(params: dict) -> dict:
    """Opt-in int8 for the stacked embedding tables and LM heads — the
    per-step table slice/gather is ~250 MB/frame of bf16 HBM traffic at
    flagship dims (a [V,D] head slice is read whole every micro-step).
    Per-channel symmetric scales along the non-indexed axis; serving-mode
    numerics (not the parity default), same contract as
    trunk.quantize_trunk_int8."""
    out = dict(params)
    for k in ("embeds", "lm_heads"):
        if k not in params:  # already quantized — idempotent
            continue
        w = jnp.asarray(params[k], jnp.float32)
        scale = jnp.maximum(
            jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0, 1e-8
        )
        out[k + "_i8"] = jnp.round(w / scale).astype(jnp.int8)
        out[k + "_s"] = scale.astype(jnp.bfloat16)
        del out[k]
    return out


def _embed_table(params: dict, table_idx, prev_code, dtype):
    """Per-step group-embedding row: stacked-table dynamic index + gather
    (int8-aware)."""
    if "embeds_i8" in params:
        tab = jax.lax.dynamic_index_in_dim(
            params["embeds_i8"], table_idx, axis=0, keepdims=False
        )
        s = jax.lax.dynamic_index_in_dim(
            params["embeds_s"], table_idx, axis=0, keepdims=False
        )  # [1, D]
        return tab[prev_code].astype(dtype) * s.astype(dtype)
    tab = jax.lax.dynamic_index_in_dim(
        params["embeds"], table_idx, axis=0, keepdims=False
    )
    return tab[prev_code]


def _lm_head_logits(params: dict, hidden, head_idx):
    if "lm_heads_i8" in params:
        head = jax.lax.dynamic_index_in_dim(
            params["lm_heads_i8"], head_idx, axis=0, keepdims=False
        )
        s = jax.lax.dynamic_index_in_dim(
            params["lm_heads_s"], head_idx, axis=0, keepdims=False
        )  # [1, V]
        return (hidden @ head.astype(hidden.dtype)).astype(jnp.float32) * (
            s.astype(jnp.float32)
        )
    head = jax.lax.dynamic_index_in_dim(
        params["lm_heads"], head_idx, axis=0, keepdims=False
    )
    return (hidden @ head).astype(jnp.float32)


def alloc_subtalker_cache(
    cfg: CodePredictorConfig, batch: int, dtype=jnp.float32,
    *, kv_int8: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-frame micro-decode KV cache (lives in the scan carry).

    ``kv_int8`` uses the quantized dict form (ops/attention.KVCache) — the
    sub-talker's attention+cache term is the dominant batch-scaling cost of
    serving decode (measured 0.87→2.39 ms/frame from b32→b96 at 16 groups,
    scripts/bench_subtalker_ablate.py), and int8 halves its read traffic at
    the cost of a quantize per write."""
    shape = (
        cfg.num_hidden_layers,
        batch,
        cfg.num_code_groups,
        cfg.num_key_value_heads,
        cfg.head_dim,
    )
    if kv_int8:
        def one():
            return {
                "i8": jnp.zeros(shape, jnp.int8),
                "s": jnp.full(shape[:-1], 1e-8, jnp.float32),
            }
        return one(), one()
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def subtalker_generate(
    params: dict,
    cfg: CodePredictorConfig,
    talker_codec_embedding: jnp.ndarray,  # [V_talker, D_talker] (group-0 table)
    prev_hidden: jnp.ndarray,             # [B, D_talker] talker post-norm hidden
    first_code: jnp.ndarray,              # [B] codebook-0 token
    sampling: SamplingConfig,
    rng: Optional[jax.Array],
    *,
    vec_sampling=None,  # Optional[VecSampling] — per-row controls
    unroll: Optional[int] = None,
    unroll_layers: Optional[bool] = None,
    kv_int8: Optional[bool] = None,
) -> jnp.ndarray:
    """Run the full micro-decode for one frame. Returns codes [B, G] int32
    (slot 0 = first_code). Fully traceable — lives inside the jitted talker
    decode loop.

    ``unroll`` / ``unroll_layers`` control straight-lining of the G-step scan
    and the 5-layer trunk loop. Defaults are the measured-fastest per weight
    format on v5e (scripts/bench_subtalker.py, b32 flagship dims): int8
    weights want full straight-lining so the int8→bf16 dequant stays fused
    into each dot (rolled loops let XLA hoist + materialize bf16 copies:
    10.9→6.1 ms/frame int8Lu4 vs 9.2 rolled); bf16 weights run fastest with
    the rolled fori/scan (unrolling regressed to 19.1 ms/frame)."""
    import os

    is_int8 = any(k.endswith("_i8") for k in params["trunk"])
    if unroll is None:
        # Tuning override (read at trace time): the measured-best default is
        # shape-dependent at the extremes — b128's unrolled int8 body spills
        # VMEM the same way the 32-group b64 cliff did (CLAUDE.md ledger).
        env = os.environ.get("QTTS_ST_UNROLL")
        unroll = int(env) if env else (4 if is_int8 else 1)
    if unroll_layers is None:
        env = os.environ.get("QTTS_ST_UNROLL_LAYERS")
        unroll_layers = bool(int(env)) if env else is_int8
    if kv_int8 is None:
        kv_int8 = bool(int(os.environ.get("QTTS_ST_KV8", "0")))
    g = cfg.num_code_groups
    dims = subtalker_dims(cfg)
    b = prev_hidden.shape[0]
    dtype = params["norm"].dtype

    k_cache, v_cache = alloc_subtalker_cache(cfg, b, dtype, kv_int8=kv_int8)
    cos_all, sin_all = rope_cos_sin(
        jnp.arange(g, dtype=jnp.int32), cfg.head_dim, cfg.rope_theta
    )  # [G, hd]

    def step(carry, pos_and_rng):
        kc, vc, prev_code = carry
        pos, step_rng = pos_and_rng

        # Input selection by position (see module docstring schedule).
        emb_prev = talker_codec_embedding[prev_code]           # pos == 1 case
        table_idx = jnp.maximum(pos - 2, 0)
        emb_group = _embed_table(params, table_idx, prev_code, dtype)  # pos >= 2
        x = jnp.where(
            pos == 0,
            prev_hidden.astype(dtype),
            jnp.where(pos == 1, emb_prev, emb_group),
        )
        x = _project_input(params, x)

        cos = jnp.broadcast_to(cos_all[pos][None], (b, cfg.head_dim))
        sin = jnp.broadcast_to(sin_all[pos][None], (b, cfg.head_dim))
        hidden, kc, vc = trunk_decode_step(
            params["trunk"], dims, x, cos, sin, kc, vc, pos + 1,
            unroll_layers=unroll_layers,
        )
        hidden = rms_norm(hidden, params["norm"], cfg.rms_norm_eps)

        head_idx = jnp.maximum(pos - 1, 0)
        logits = _lm_head_logits(params, hidden, head_idx)
        if vec_sampling is not None:
            # Per-row controls (continuous batching: each slot keeps its own
            # subtalker_do_sample/temperature/top_k/top_p; the reference's
            # sub-talker applies warpers only — no penalty/min-new).
            from qwen_tts_tpu.ops.sampling_vec import sample_token_vec

            code = sample_token_vec(logits, vec_sampling, step_rng)
        else:
            code = sample_token(logits, sampling, step_rng)
        # Position 0 produces no token; keep first_code as "previous".
        code = jnp.where(pos == 0, prev_code, code)
        return (kc, vc, code), code

    if rng is not None and (sampling.do_sample or vec_sampling is not None):
        rngs = jax.random.split(rng, g)
    else:
        rngs = jnp.zeros((g, 2), jnp.uint32)
    positions = jnp.arange(g, dtype=jnp.int32)

    split = bool(int(os.environ.get("QTTS_ST_SPLIT", "0")))
    if split and g >= 8 and g % 2 == 0 and not kv_int8:
        # Two-phase scan: positions < G/2 attend over a HALF-length cache —
        # bit-identical math (the masked tail contributes exact zeros after
        # softmax), but the attention+cache reads of the first half shrink
        # 2×. That term is the dominant batch-scaling cost of serving decode
        # (0.87→2.39 ms/frame b32→b96 at 16 groups).
        # MEASURED NEGATIVE on v5e (round 3): b96 565→496×, b32 462→399× —
        # doubling the straight-lined int8 scan body costs more (VMEM /
        # scheduling) than the saved reads. Kept as a documented knob; do
        # not enable on this stack.
        half = g // 2

        def half_cache(c):
            return jax.tree_util.tree_map(lambda x: x[:, :, :half], c)

        def pad_cache(c_small, c_full):
            return jax.tree_util.tree_map(
                lambda s, f: jax.lax.dynamic_update_slice(
                    f, s, (0,) * f.ndim),
                c_small, c_full,
            )

        (kc_h, vc_h, code_h), codes1 = jax.lax.scan(
            step, (half_cache(k_cache), half_cache(v_cache), first_code),
            (positions[:half], rngs[:half]), unroll=unroll,
        )
        kc = pad_cache(kc_h, k_cache)
        vc = pad_cache(vc_h, v_cache)
        (_, _, _), codes2 = jax.lax.scan(
            step, (kc, vc, code_h),
            (positions[half:], rngs[half:]), unroll=unroll,
        )
        codes = jnp.concatenate([codes1, codes2], axis=0)
    else:
        (_, _, _), codes = jax.lax.scan(
            step, (k_cache, v_cache, first_code), (positions, rngs),
            unroll=unroll,
        )
    # codes[p] is the token emitted after position p; position 0 emitted none.
    # Groups 1..G-1 come from positions 1..G-1; stack group 0 in front.
    codes = jnp.concatenate([first_code[None], codes[1:]], axis=0)  # [G, B]
    return codes.T.astype(jnp.int32)


def subtalker_generate_jacobi(
    params: dict,
    cfg: CodePredictorConfig,
    talker_codec_embedding: jnp.ndarray,  # [V_talker, D_talker]
    prev_hidden: jnp.ndarray,             # [B, D_talker]
    first_code: jnp.ndarray,              # [B]
    *,
    sampling: "Optional[SamplingConfig]" = None,
    rng: Optional[jax.Array] = None,
    vec_sampling=None,  # Optional[VecSampling] — per-row controls
    fixed_iters: Optional[int] = None,
    return_iters: bool = False,
) -> jnp.ndarray:
    """Micro-decode as a Jacobi fixed-point iteration (exact).

    Instead of G-1 sequential micro-steps (each streaming the whole 5-layer
    trunk from HBM — the measured decode bottleneck, CLAUDE.md ledger), guess
    all group tokens at once and iterate FULL-SEQUENCE forwards:

        codes_{k+1}[p] = argmax lm_head[p-1](trunk(inputs(codes_k))[p])

    Causality gives the standard Jacobi-decoding guarantee: after iteration
    k the first k groups equal the sequential greedy trace exactly (group 1
    depends only on known inputs, group 2 only on group 1, ...), so the
    fixed point IS the sequential trace and is reached in ≤ G-1 iterations —
    usually far fewer on trained weights, where most groups are predictable
    from the trunk hidden alone. Per iteration the trunk weights stream ONCE
    (vs once per micro-step) and the G-position forward runs as MXU-batched
    matmuls; the crossover vs the sequential scan is ~G/3 iterations at
    flagship dims.

    SAMPLING works too, bit-exactly, via the Gumbel-max reparameterization
    already inside ``jax.random.categorical``: pass ``sampling`` (with
    ``do_sample``) and ``rng``, and each position p's token is sampled with
    the SAME per-position key the sequential scan uses (``split(rng, g)``,
    key p for position p). Given its fixed key, position p's warped-logits →
    categorical draw is a deterministic function of codes < p, so the Jacobi
    fixed point IS the sequential sampled trace — exact ancestral sampling,
    not an approximation. Exactness is up to XLA reduction-order on the
    logits — the same caveat as every bf16 parity contract in this repo.
    The talker side is unchanged; this is the structural "fewer
    weight-bytes per frame" lever the ablation bench said was the only
    remaining sub-talker axis.

    ``fixed_iters`` pins the iteration count (static cost — for benching and
    for batch-serving where a data-dependent while_loop would sync rows);
    default runs a while_loop to the fixed point with a G-1 safety cap.
    Reference semantics anchor: modeling_qwen3_tts.py:1015-1319 (the
    sequential schedule this converges to).
    """
    from qwen_tts_tpu.models.trunk import trunk_prefill

    g = cfg.num_code_groups
    dims = subtalker_dims(cfg)
    b = prev_hidden.shape[0]
    dtype = params["norm"].dtype

    do_sample = rng is not None and (
        (sampling is not None and sampling.do_sample) or vec_sampling is not None
    )
    if do_sample:
        # Identical key schedule to the sequential scan (split(rng, g);
        # position 0 emits nothing, position p >= 1 uses key p) so the fixed
        # point reproduces the sequential sampled trace bit-for-bit — for
        # both the static SamplingConfig path and the per-row VecSampling
        # path (continuous batching).
        pos_rngs = jax.random.split(rng, g)
        if vec_sampling is not None:
            from qwen_tts_tpu.ops.sampling_vec import sample_token_vec

            def draw(logits_i, key):
                return sample_token_vec(logits_i, vec_sampling, key)
        else:
            def draw(logits_i, key):
                return sample_token(logits_i, sampling, key)

    positions = jnp.broadcast_to(jnp.arange(g)[None], (b, g))
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    x0 = prev_hidden.astype(dtype)[:, None]                     # [B, 1, D]
    x1 = talker_codec_embedding[first_code].astype(dtype)[:, None]
    group_ids = jnp.arange(g - 2)

    def forward(codes):
        # inputs: pos p>=2 embeds group (p-1)'s token via table p-2
        if "embeds_i8" in params:
            rest = params["embeds_i8"][group_ids[:, None], codes[:, 1 : g - 1].T]
            rest = rest.astype(dtype) * params["embeds_s"][group_ids].astype(
                dtype
            )  # [G-2,1,D] broadcasts over [G-2,B,D]
        else:
            rest = params["embeds"][group_ids[:, None], codes[:, 1 : g - 1].T]
        x = jnp.concatenate(
            [x0, x1, jnp.transpose(rest, (1, 0, 2)).astype(dtype)], axis=1
        )
        x = _project_input(params, x)
        # Straight-line the 5-layer stack when int8 so the dequant fuses into
        # each dot (same tuning as the sequential decode path).
        unroll = (
            dims.num_layers
            if any(k.endswith("_i8") for k in params["trunk"])
            else 1
        )
        hidden, _, _ = trunk_prefill(
            params["trunk"], dims, x, cos, sin, unroll=unroll
        )
        hidden = rms_norm(hidden, params["norm"], cfg.rms_norm_eps)
        if "lm_heads_i8" in params:
            logits = jnp.einsum(
                "bid,idv->biv",
                hidden[:, 1:],
                params["lm_heads_i8"].astype(dtype),
            ).astype(jnp.float32) * params["lm_heads_s"][:, 0].astype(
                jnp.float32
            )  # [G-1, V] broadcasts over [B, G-1, V]
        else:
            logits = jnp.einsum(
                "bid,idv->biv", hidden[:, 1:], params["lm_heads"]
            ).astype(jnp.float32)
        if do_sample:
            # Same warp chain + categorical draw as the sequential step,
            # vmapped over positions (per-key threefry streams are
            # batching-invariant, so this stays bit-equal to per-position
            # calls — pinned by tests) to batch the 15 top-k sorts.
            new = jax.vmap(draw, in_axes=(1, 0), out_axes=1)(
                logits, pos_rngs[1:g]
            )
        else:
            new = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, G-1]
        return jnp.concatenate([first_code[:, None], new], axis=1)

    codes0 = jnp.concatenate(
        [first_code[:, None], jnp.zeros((b, g - 1), jnp.int32)], axis=1
    )

    if fixed_iters is not None:
        codes = codes0
        for _ in range(fixed_iters):
            codes = forward(codes)
        return codes

    def cond(carry):
        codes, prev, it = carry
        return (it < g - 1) & ((it == 0) | jnp.any(codes != prev))

    def body(carry):
        codes, _, it = carry
        return forward(codes), codes, it + 1

    codes, _, iters = jax.lax.while_loop(
        cond, body, (codes0, codes0, jnp.zeros((), jnp.int32))
    )
    if return_iters:
        # iters counts forward() calls including the final verification pass
        # (codes unchanged) — "converged in k" shows up as k+1 here unless
        # the G-1 cap hit first. A checkpoint property: acceptance.py probes
        # it on real weights to decide whether Jacobi serving pays.
        return codes, iters
    return codes


def embed_groups_sum(
    params: dict,
    talker_codec_embedding: jnp.ndarray,  # [V_talker, D_talker]
    codes: jnp.ndarray,                   # [B, G]
) -> jnp.ndarray:
    """Σ of all G group embeddings — the talker's next-frame audio-track input
    (modeling_qwen3_tts.py:1682-1687). Group 0 uses the talker table; groups
    1..G-1 use the stacked sub-talker tables (one batched gather)."""
    g = codes.shape[1]
    first = talker_codec_embedding[codes[:, 0]]                   # [B, D]
    # embeds: [G-1, V, D]; gather per group via take_along-style indexing.
    group_ids = jnp.arange(g - 1)                                  # [G-1]
    if "embeds_i8" in params:
        rest = params["embeds_i8"][group_ids[:, None], codes[:, 1:].T]
        rest = rest.astype(first.dtype) * params["embeds_s"].astype(first.dtype)
    else:
        rest = params["embeds"][group_ids[:, None], codes[:, 1:].T]  # [G-1, B, D]
    return first + jnp.sum(rest, axis=0)
