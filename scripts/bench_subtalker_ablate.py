#!/usr/bin/env python3
"""Ablation micro-benchmark for the sub-talker 32-step micro-decode.

CLAUDE.md: int8 serving runs ~5.4 ms/frame at b32 flagship dims vs a ~2.9
ms/frame weight-streaming floor; the residual is believed to be per-step op
overhead (~16 us/layer-step). This script localizes it by switching decode
components off one at a time, all inside the same frames-scan harness as
scripts/bench_subtalker.py:

  full        the real micro-decode (subtalker_generate, int8 trunk)
  nosample    skip the greedy argmax (code = prev)
  nohead      skip lm_head gather+matmul too
  noembed     skip per-step embedding select (x = prev_hidden each step)
  trunk       trunk only: no embed/lm_head/sampling, x = hidden carry
  noattn      trunk minus attention+cache (pure matmul chain) — bandwidth-only
  nowrite     trunk with attention but no KV-cache writes (stale cache)
  kvmerged    trunk with K and V in ONE [2,...] buffer (1 write/layer-step)
  maskpre     trunk with the per-step position mask precomputed outside

Each variant reports ms/frame so (full - trunk) = non-trunk overhead and
(trunk - noattn) = attention+cache cost.

Usage: python scripts/bench_subtalker_ablate.py [--batch 32] [--groups 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--frames", type=int, default=25)
    p.add_argument("--groups", type=int, default=32)
    p.add_argument(
        "--variants",
        default="full,nosample,nohead,noembed,trunk,nowrite,noattn,kvmerged,maskpre",
    )
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from qwen_tts_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from qwen_tts_tpu.config import TalkerConfig
    from qwen_tts_tpu.models import subtalker as st_mod
    from qwen_tts_tpu.models.trunk import quantize_trunk_int8, _project_qkv, _mlp, _w_matmul
    from qwen_tts_tpu.ops.attention import attention_decode_step
    from qwen_tts_tpu.ops.norms import rms_norm
    from qwen_tts_tpu.ops.rope import apply_rope, rope_cos_sin
    from qwen_tts_tpu.ops.sampling import SamplingConfig

    cfg0 = TalkerConfig()
    cp = dataclasses.replace(cfg0.code_predictor, num_code_groups=args.groups)
    cfg = dataclasses.replace(cfg0, num_code_groups=args.groups, code_predictor=cp)
    ccfg = cfg.code_predictor
    dims = st_mod.subtalker_dims(ccfg)
    dtype = jnp.bfloat16
    b = args.batch
    g = args.groups

    rng = jax.random.PRNGKey(0)
    st_params = st_mod.init_subtalker_params(
        jax.random.fold_in(rng, 1), ccfg, cfg.hidden_size, dtype
    )
    st_params["trunk"] = quantize_trunk_int8(st_params["trunk"])
    st_params = st_mod.quantize_subtalker_tables_int8(st_params)
    codec_embedding = jax.random.normal(
        jax.random.fold_in(rng, 2), (cfg.vocab_size, cfg.hidden_size), dtype
    )
    greedy = SamplingConfig(do_sample=False)
    cos_all, sin_all = rope_cos_sin(
        jnp.arange(g, dtype=jnp.int32), ccfg.head_dim, ccfg.rope_theta
    )

    # --- variant micro-decodes -------------------------------------------
    def micro_custom(st_params, codec_embedding, hidden0, first, *, embed,
                     head, sample, attn, write, kv_layout, premask,
                     embed_flat=False, argmax_bf16=False, defer_write=False):
        def layer_params(l):
            return jax.tree_util.tree_map(lambda p: p[l], st_params["trunk"])
        """One frame's micro-decode with components toggled. Mirrors
        subtalker_generate's int8 defaults: fully straight-lined (layer loop
        python-unrolled, step scan unroll=4)."""
        kshape = (dims.num_layers, b, g, dims.kv_heads, dims.head_dim)
        if kv_layout == "merged":
            kv_cache = jnp.zeros((2,) + kshape, dtype)
        else:
            k_cache = jnp.zeros(kshape, dtype)
            v_cache = jnp.zeros(kshape, dtype)
        rows = jnp.arange(b)
        j_idx = jnp.arange(g)
        masks = j_idx[None, :] <= jnp.arange(g)[:, None]  # [G, G] step mask

        def trunk_step(h, kc, vc, kvm, pos, mask_row):
            cos = jnp.broadcast_to(cos_all[pos][None], (b, dims.head_dim))
            sin = jnp.broadcast_to(sin_all[pos][None], (b, dims.head_dim))
            new_ks, new_vs = [], []
            for l in range(dims.num_layers):
                layer = layer_params(l)
                x = rms_norm(h, layer["input_norm"], dims.eps)
                q, k, v = _project_qkv(layer, x, dims)
                q = apply_rope(q, cos[:, None, :], sin[:, None, :])
                k = apply_rope(k, cos[:, None, :], sin[:, None, :])
                if attn:
                    if defer_write:
                        # Attend over strictly-past cache + the current token
                        # as an explicit extra position; ALL layers' K/V are
                        # written in ONE stacked scatter after the layer loop
                        # (2 scatters/step instead of 2 per layer-step).
                        new_ks.append(k)
                        new_vs.append(v)
                        gq = dims.heads // dims.kv_heads
                        qg = q.reshape(b, dims.kv_heads, gq, dims.head_dim)
                        sc = jnp.float32(dims.head_dim ** -0.5)
                        scores = jnp.einsum(
                            "bkgd,bjkd->bkgj", qg, kc[l],
                            preferred_element_type=jnp.float32) * sc
                        past = jnp.arange(g)[None, :] < pos
                        scores = jnp.where(past[:, None, None, :], scores,
                                           jnp.float32(-1e9))
                        s_cur = jnp.einsum(
                            "bkgd,bkd->bkg", qg, k,
                            preferred_element_type=jnp.float32)[..., None] * sc
                        allsc = jnp.concatenate([scores, s_cur], axis=-1)
                        m = jnp.max(allsc, axis=-1, keepdims=True)
                        p_ = jnp.exp(allsc - m)
                        p_ = p_ / jnp.sum(p_, axis=-1, keepdims=True)
                        a = jnp.einsum(
                            "bkgj,bjkd->bkgd", p_[..., :-1].astype(vc.dtype),
                            vc[l], preferred_element_type=jnp.float32)
                        a = a + jnp.einsum(
                            "bkg,bkd->bkgd",
                            p_[..., -1].astype(jnp.float32),
                            v.astype(jnp.float32))
                        a = a.reshape(b, dims.heads, dims.head_dim).astype(q.dtype)
                        h = h + _w_matmul(layer, "wo", a.reshape(b, -1))
                        h = h + _mlp(layer, rms_norm(
                            h, layer["post_attn_norm"], dims.eps))
                        continue
                    if kv_layout == "merged":
                        if write:
                            kvm = kvm.at[:, l, rows, pos].set(
                                jnp.stack([k, v]).astype(kvm.dtype))
                        kl, vl = kvm[0, l], kvm[1, l]
                    elif kv_layout == "dus":
                        # All rows share the write position in the sub-talker
                        # micro-decode, so one contiguous dynamic_update_slice
                        # covers the whole batch (vs 2 scatters/layer-step).
                        if write:
                            kc = jax.lax.dynamic_update_slice(
                                kc, k[None, :, None].astype(kc.dtype),
                                (l, 0, pos, 0, 0))
                            vc = jax.lax.dynamic_update_slice(
                                vc, v[None, :, None].astype(vc.dtype),
                                (l, 0, pos, 0, 0))
                        kl, vl = kc[l], vc[l]
                    else:
                        if write:
                            kc = kc.at[l, rows, pos].set(k.astype(kc.dtype))
                            vc = vc.at[l, rows, pos].set(v.astype(vc.dtype))
                        kl, vl = kc[l], vc[l]
                    if premask:
                        # mask precomputed per step, shared across layers
                        qg = q.reshape(b, dims.kv_heads,
                                       dims.heads // dims.kv_heads, dims.head_dim)
                        scores = jnp.einsum(
                            "bkgd,bjkd->bkgj", qg, kl,
                            preferred_element_type=jnp.float32,
                        ) * jnp.float32(dims.head_dim ** -0.5)
                        scores = jnp.where(mask_row[None, None, None, :],
                                           scores, jnp.float32(-1e9))
                        probs = jnp.exp(
                            scores - jnp.max(scores, axis=-1, keepdims=True))
                        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
                        a = jnp.einsum(
                            "bkgj,bjkd->bkgd", probs.astype(vl.dtype), vl,
                            preferred_element_type=jnp.float32,
                        ).reshape(b, dims.heads, dims.head_dim).astype(q.dtype)
                    else:
                        a = attention_decode_step(q, kl, vl, cur_len=pos + 1)
                else:
                    a = q
                h = h + _w_matmul(layer, "wo", a.reshape(b, -1))
                h = h + _mlp(layer, rms_norm(h, layer["post_attn_norm"], dims.eps))
            if defer_write and attn:
                kc = kc.at[:, rows, pos].set(
                    jnp.stack(new_ks).astype(kc.dtype))
                vc = vc.at[:, rows, pos].set(
                    jnp.stack(new_vs).astype(vc.dtype))
            return h, kc, vc, kvm

        def step(carry, pos_and_mask):
            if kv_layout == "merged":
                kvm, prev_code, h_carry = carry
                kc = vc = None
            else:
                kc, vc, prev_code, h_carry = carry
                kvm = None
            pos, mask_row = pos_and_mask
            if embed:
                emb_prev = codec_embedding[prev_code]
                table_idx = jnp.maximum(pos - 2, 0)
                if embed_flat:
                    # One gather of B rows from the flattened [G1*V, D] table
                    # instead of dynamic_index (2 MB slice) + row gather.
                    flat = st_params["embeds_i8"].reshape(
                        -1, st_params["embeds_i8"].shape[-1])
                    idx = table_idx * ccfg.vocab_size + prev_code
                    s = jax.lax.dynamic_index_in_dim(
                        st_params["embeds_s"], table_idx, axis=0,
                        keepdims=False)
                    emb_group = flat[idx].astype(dtype) * s.astype(dtype)
                else:
                    emb_group = st_mod._embed_table(
                        st_params, table_idx, prev_code, dtype)
                x = jnp.where(pos == 0, hidden0.astype(dtype),
                              jnp.where(pos == 1, emb_prev, emb_group))
            else:
                x = h_carry
            h, kc, vc, kvm = trunk_step(x, kc, vc, kvm, pos, mask_row)
            if head:
                hn = rms_norm(h, st_params["norm"], ccfg.rms_norm_eps)
                head_idx = jnp.maximum(pos - 1, 0)
                if argmax_bf16:
                    hd_ = jax.lax.dynamic_index_in_dim(
                        st_params["lm_heads_i8"], head_idx, axis=0,
                        keepdims=False)
                    s = jax.lax.dynamic_index_in_dim(
                        st_params["lm_heads_s"], head_idx, axis=0,
                        keepdims=False)
                    logits = (hn @ hd_.astype(hn.dtype)) * s.astype(hn.dtype)
                else:
                    logits = st_mod._lm_head_logits(st_params, hn, head_idx)
                if sample:
                    code = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                else:
                    code = prev_code + jnp.int32(1)
                    code = code % ccfg.vocab_size
            else:
                code = (prev_code + jnp.int32(1)) % ccfg.vocab_size
            code = jnp.where(pos == 0, prev_code, code)
            if kv_layout == "merged":
                return (kvm, code, h * 0.999), code
            return (kc, vc, code, h * 0.999), code

        positions = jnp.arange(g, dtype=jnp.int32)
        if kv_layout == "merged":
            carry0 = (kv_cache, first, hidden0.astype(dtype))
        else:
            carry0 = (k_cache, v_cache, first, hidden0.astype(dtype))
        carry, codes = jax.lax.scan(
            step, carry0, (positions, masks), unroll=4)
        # carry[-1] is the final trunk hidden — returned so the harness can
        # keep the trunk live even when codes don't depend on it (otherwise
        # XLA dead-code-eliminates the whole trunk for head=False variants).
        return codes, carry[-1]

    VARIANTS = {
        "nosample": dict(embed=True, head=True, sample=False, attn=True,
                         write=True, kv_layout="split", premask=False),
        "nohead": dict(embed=True, head=False, sample=False, attn=True,
                       write=True, kv_layout="split", premask=False),
        "noembed": dict(embed=False, head=True, sample=True, attn=True,
                        write=True, kv_layout="split", premask=False),
        "trunk": dict(embed=False, head=False, sample=False, attn=True,
                      write=True, kv_layout="split", premask=False),
        "nowrite": dict(embed=False, head=False, sample=False, attn=True,
                        write=False, kv_layout="split", premask=False),
        "noattn": dict(embed=False, head=False, sample=False, attn=False,
                       write=False, kv_layout="split", premask=False),
        "kvmerged": dict(embed=False, head=False, sample=False, attn=True,
                         write=True, kv_layout="merged", premask=False),
        "maskpre": dict(embed=False, head=False, sample=False, attn=True,
                        write=True, kv_layout="split", premask=True),
        "fullkvm": dict(embed=True, head=True, sample=True, attn=True,
                        write=True, kv_layout="merged", premask=True),
        "dusw": dict(embed=False, head=False, sample=False, attn=True,
                     write=True, kv_layout="dus", premask=False),
        "fulldus": dict(embed=True, head=True, sample=True, attn=True,
                        write=True, kv_layout="dus", premask=False),
        "embflat": dict(embed=True, head=True, sample=True, attn=True,
                        write=True, kv_layout="split", premask=False,
                        embed_flat=True),
        "argb16": dict(embed=True, head=True, sample=True, attn=True,
                       write=True, kv_layout="split", premask=False,
                       argmax_bf16=True),
        "allfast": dict(embed=True, head=True, sample=True, attn=True,
                        write=True, kv_layout="dus", premask=False,
                        embed_flat=True, argmax_bf16=True),
        "trunkdw": dict(embed=False, head=False, sample=False, attn=True,
                        write=True, kv_layout="split", premask=False,
                        defer_write=True),
        "fulldw": dict(embed=True, head=True, sample=True, attn=True,
                       write=True, kv_layout="split", premask=False,
                       defer_write=True),
        "fulldwf": dict(embed=True, head=True, sample=True, attn=True,
                        write=True, kv_layout="split", premask=False,
                        defer_write=True, embed_flat=True),
    }

    def frames_harness(frame_fn):
        def loop(st_params, codec_embedding, hidden, first):
            def body(carry, _):
                hidden, first = carry
                codes, h_last = frame_fn(st_params, codec_embedding, hidden, first)
                first = codes[-1] % ccfg.vocab_size
                # Fold BOTH the codes and the final trunk hidden into the next
                # frame's input so no variant's compute is dead code.
                hidden = hidden + (codes.sum(axis=0) % 3).astype(
                    hidden.dtype)[:, None] * 1e-6 + h_last.astype(
                    hidden.dtype) * 1e-6
                return (hidden, first), codes[1]
            (hidden, first), _ = jax.lax.scan(
                body, (hidden, first), None, length=args.frames)
            return hidden, first
        return jax.jit(loop)

    hidden = jax.random.normal(
        jax.random.fold_in(rng, 3), (b, cfg.hidden_size), dtype)
    first = jnp.zeros((b,), jnp.int32)

    results = {}
    for name in args.variants.split(","):
        if name == "full":
            def frame_fn(sp, ce, h, f):
                codes = st_mod.subtalker_generate(
                    sp, ccfg, ce, h, f, greedy, None).T
                return codes, h
        else:
            kw = VARIANTS[name]
            def frame_fn(sp, ce, h, f, kw=kw):
                return micro_custom(sp, ce, h, f, **kw)
        fn = frames_harness(frame_fn)
        h_out, f_out = fn(st_params, codec_embedding, hidden, first)
        float(jnp.sum(f_out) + jnp.sum(h_out.astype(jnp.float32)))  # force fetch
        t0 = time.perf_counter()
        runs = 3
        for _ in range(runs):
            h_out, f_out = fn(st_params, codec_embedding, hidden, first)
            float(jnp.sum(f_out) + jnp.sum(h_out.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / runs
        ms_frame = dt / args.frames * 1e3
        results[name] = ms_frame
        print(f"{name:10s} {ms_frame:7.3f} ms/frame")

    if "full" in results and "trunk" in results:
        print(f"\nnon-trunk overhead (full-trunk): "
              f"{results['full'] - results['trunk']:.3f} ms/frame")
    if "trunk" in results and "noattn" in results:
        print(f"attention+cache cost (trunk-noattn): "
              f"{results['trunk'] - results['noattn']:.3f} ms/frame")


if __name__ == "__main__":
    main()
