"""Greedy-parity validation: the production jitted decode loop vs an
independent, cache-free eager decoder.

The reference validates its C engine against the Python model by comparing
greedy (top-k 1) token traces and EOS stop steps
(scripts/validate_eos_parity.py:104-176). This framework has one engine, so
the oracle is an architecturally different decode path: every step re-runs the
full prefix forward **without any KV cache** and the sub-talker as an explicit
per-position loop. Agreement proves the fixed-shape cached attention, masking
and position bookkeeping of the fast path.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qwen_tts_tpu.config import TTSConfig
from qwen_tts_tpu.generate import (
    GenerationParams,
    Prompt,
    batch_prompts,
    generate_codes,
)
from qwen_tts_tpu.models import subtalker as st_mod
from qwen_tts_tpu.models import talker as talker_mod
from qwen_tts_tpu.models.trunk import trunk_decode_step
from qwen_tts_tpu.ops.norms import rms_norm
from qwen_tts_tpu.ops.rope import rope_cos_sin
from qwen_tts_tpu.ops.sampling import build_suppress_mask


class Trace(NamedTuple):
    tokens: List[int]        # codebook-0 trace (excluding EOS)
    stop_reason: str         # "eos" | "max_tokens"
    stop_step: int


def _greedy_eager_subtalker(st_params, cp_cfg, talker_emb, hidden, first_code):
    """Per-position loop (no scan) — mirrors the schedule explicitly."""
    dims = st_mod.subtalker_dims(cp_cfg)
    kc, vc = st_mod.alloc_subtalker_cache(cp_cfg, 1, st_params["norm"].dtype)
    codes = [int(first_code)]
    prev = jnp.asarray([first_code], jnp.int32)
    for pos in range(cp_cfg.num_code_groups):
        if pos == 0:
            x = hidden[None]
        elif pos == 1:
            x = talker_emb[prev]
        else:
            x = st_params["embeds"][pos - 2][prev]
        x = st_mod._project_input(st_params, x)
        cos, sin = rope_cos_sin(jnp.full((1,), pos), cp_cfg.head_dim,
                                cp_cfg.rope_theta)
        h, kc, vc = trunk_decode_step(st_params["trunk"], dims, x, cos, sin,
                                      kc, vc, jnp.int32(pos + 1))
        h = rms_norm(h, st_params["norm"], cp_cfg.rms_norm_eps)
        if pos >= 1:
            logits = h @ st_params["lm_heads"][pos - 1]
            prev = jnp.argmax(logits, -1).astype(jnp.int32)
            codes.append(int(prev[0]))
    return codes


def eager_greedy_trace(
    talker_params: dict,
    st_params: dict,
    cfg: TTSConfig,
    prompt: Prompt,
    max_new_tokens: int,
) -> Trace:
    """Cache-free greedy decode: the whole prefix is re-forwarded each step."""
    tk = cfg.talker
    suppress = np.asarray(
        build_suppress_mask(tk.vocab_size, tk.codec_eos_token_id,
                            tail=tk.suppress_tail)
    )
    embeds = np.asarray(prompt.embeds, np.float32)
    trailing = np.asarray(prompt.trailing_text, np.float32)
    tts_pad = np.asarray(prompt.tts_pad_embed, np.float32)

    tokens: List[int] = []
    for step in range(max_new_tokens + 1):
        s = embeds.shape[0]
        kc, vc = talker_mod.alloc_kv_cache(tk, 1, s, jnp.float32)
        out = talker_mod.talker_prefill(
            talker_params, tk, jnp.asarray(embeds[None]),
            jnp.ones((1, s), bool), kc, vc,
        )
        logits = np.asarray(out.logits)[0]
        logits = np.where(suppress, -1e9, logits)
        token = int(np.argmax(logits))
        if token == tk.codec_eos_token_id:
            return Trace(tokens, "eos", step)
        if step == max_new_tokens:
            break
        tokens.append(token)
        frame = _greedy_eager_subtalker(
            st_params, tk.code_predictor, talker_params["codec_embedding"],
            out.last_hidden[0], token,
        )
        emb = np.asarray(
            st_mod.embed_groups_sum(
                st_params, talker_params["codec_embedding"],
                jnp.asarray([frame], jnp.int32),
            )
        )[0]
        emb = emb + (trailing[step] if step < trailing.shape[0] else tts_pad)
        embeds = np.concatenate([embeds, emb[None]], axis=0)
    return Trace(tokens, "max_tokens", max_new_tokens)


def fast_greedy_trace(
    talker_params: dict,
    st_params: dict,
    cfg: TTSConfig,
    prompt: Prompt,
    max_new_tokens: int,
) -> Trace:
    """The production jitted path, greedy."""
    gp = GenerationParams(max_new_tokens=max_new_tokens).greedy()
    embeds, mask, trailing, _ = batch_prompts([prompt], bucket=1)
    out = generate_codes(
        talker_params, st_params, cfg.talker,
        jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(trailing),
        sampling=gp.talker_sampling(), st_sampling=gp.subtalker_sampling(),
        max_new_tokens=max_new_tokens, rng=jax.random.PRNGKey(0),
        # Token-trace comparison: keep all sampled cb0 tokens (the frame-level
        # truncation trim is a separate, frame-count concern).
        trim_last_on_budget=False,
    )
    n = int(np.asarray(out.num_gen)[0])
    stopped = bool(np.asarray(out.stopped)[0])
    tokens = [int(x) for x in np.asarray(out.codes)[0, :n, 0]]
    return Trace(tokens, "eos" if stopped else "max_tokens",
                 n if stopped else max_new_tokens)


@dataclasses.dataclass
class ParityResult:
    ok: bool
    first_divergence: Optional[int]
    fast: Trace
    eager: Trace

    def report(self) -> str:
        lines = [
            f"fast  : stop={self.fast.stop_reason}@{self.fast.stop_step} "
            f"tokens={len(self.fast.tokens)}",
            f"eager : stop={self.eager.stop_reason}@{self.eager.stop_step} "
            f"tokens={len(self.eager.tokens)}",
        ]
        if self.ok:
            lines.append("PARITY OK — token-exact greedy match")
        else:
            lines.append(f"PARITY FAIL — first divergence at step "
                         f"{self.first_divergence}")
            i = self.first_divergence or 0
            lines.append(f"  fast [{i}:] = {self.fast.tokens[i:i+8]}")
            lines.append(f"  eager[{i}:] = {self.eager.tokens[i:i+8]}")
        return "\n".join(lines)


def check_parity(
    talker_params: dict,
    st_params: dict,
    cfg: TTSConfig,
    prompt: Prompt,
    max_new_tokens: int,
) -> ParityResult:
    fast = fast_greedy_trace(talker_params, st_params, cfg, prompt, max_new_tokens)
    eager = eager_greedy_trace(talker_params, st_params, cfg, prompt, max_new_tokens)
    first_div = None
    for i, (a, b) in enumerate(zip(fast.tokens, eager.tokens)):
        if a != b:
            first_div = i
            break
    if first_div is None and len(fast.tokens) != len(eager.tokens):
        first_div = min(len(fast.tokens), len(eager.tokens))
    ok = (
        first_div is None
        and fast.stop_reason == eager.stop_reason
        and fast.stop_step == eager.stop_step
    )
    return ParityResult(ok, first_div, fast, eager)
