#!/usr/bin/env python3
"""Per-stage floor analysis for the 25 Hz (V1) decoder — VERDICT r3 item 3.

The 12 Hz sub-talker got an ablation-grade cost breakdown
(bench_subtalker_ablate.py); this does the same for the 25 Hz family so
"106x RTF" is attributable: flow-matching DiT (10 Euler steps, CFG) vs
BigVGAN, and inside each, which component owns the time.

Every variant is ONE jitted program ending in a forced device->host fetch
(axon tunnel: block_until_ready alone reports fiction), so component costs
come out as wall-clock DIFFERENCES between full and component-off programs —
dispatch overhead cancels in the subtraction. DCE guards: each variant's
output still depends on all remaining compute.

DiT variants (dit_sample with toggles; reference modeling_...v1.py:1114-1227)
  dit_full      the real 10-step CFG sampler
  dit_nocfg     guidance 0 -> single-width batch (CFG-doubling cost)
  dit_noattn    attention replaced by identity (attention + rope cost)
  dit_noff      feed-forward skipped (FF cost)
  dit_noada     AdaLN modulation replaced by plain LN (AdaLN cost)
  dit_matfloor  QKVO+FF matmuls only, no LN/ada/gelu/softmax (MXU floor)
  dit_ropeoff   rope -> identity inside live attention (rope residue;
                measured ~0 under the adopted local_hs path, round 5)
  dit_steps5    5 Euler steps (per-step marginal cost / fixed overhead)

BigVGAN variants (bigvgan_forward with toggles; reference :996-1069)
  bv_full       the real vocoder
  bv_nosnake    anti-aliased snake -> identity (activation total)
  bv_noaa       plain snake_beta without the 2x up/down kaiser-sinc pair
                (isolates the anti-alias filter cost from the sine itself)
  bv_convfloor  AMP blocks without activations (conv/tconv floor)

Plus the composed pipeline (full) and a FLOPs model per variant so each
stage's achieved TF/s is printed next to its wall.

Usage: python scripts/bench_codec_v1_ablate.py [--batch 8 --seconds 10]
       [--variants dit_full,bv_full,...] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--variants", default=(
        "full,dit_full,dit_nocfg,dit_noattn,dit_noff,dit_noada,"
        "dit_matfloor,dit_steps5,bv_full,bv_nosnake,bv_noaa,bv_convfloor"))
    p.add_argument("--json-out", default=None,
                   help="append results into this JSON file")
    p.add_argument("--attn-impl", default="local_hs",
                   choices=("local", "local_hs"),
                   help="DiT attention path for the dit_* variants "
                        "(local_hs = the adopted serving default)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from qwen_tts_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from qwen_tts_tpu.config import CodecV1Config
    from qwen_tts_tpu.models import codec_v1 as v1
    from qwen_tts_tpu.models.codec_v1 import (
        _amp_block,
        _anti_aliased_snake,
        _apply_rope_interleaved,
        _conv1d_same,
        _conv_transpose_same,
        _dit_attention_local,
        _halfsplit_rope_tables,
        _interleaved_rope_tables,
        _ln_noaffine,
        _process_mel,
        _rope_halfsplit_layer,
        _sinus_time_embedding,
    )
    from qwen_tts_tpu.models.speaker import speaker_encoder_forward
    from qwen_tts_tpu.ops.snake import snake_beta

    cfg = CodecV1Config()
    dcfg, bcfg = cfg.dit, cfg.bigvgan
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    params = v1.init_codec_v1_params(rng, cfg, dtype)

    b = args.batch
    t_codes = int(args.seconds * 25)
    t_mel = t_codes * dcfg.repeats
    codes = jax.random.randint(
        jax.random.fold_in(rng, 1), (b, t_codes), 0, dcfg.num_embeds - 1)
    xv = jax.random.normal(
        jax.random.fold_in(rng, 2), (b, dcfg.enc_emb_dim), jnp.float32)
    ref_mels = jax.random.normal(
        jax.random.fold_in(rng, 3), (b, 100, dcfg.mel_dim), jnp.float32) * 0.1

    # ---- DiT with component toggles (mirrors dit_forward/_dit_layer) ------
    def dit_layer_ab(layer, x, time_emb, cos, sin, lb_la, *, attn, ff, ada,
                     matfloor, ropeoff=False):
        if ropeoff:
            cos = sin = None
        if matfloor:
            # Pure matmul chain: QKVO + FF, no norms/softmax/gelu/gating.
            bq, t, _ = x.shape
            h, hd = dcfg.num_attention_heads, dcfg.head_dim
            q = (x @ layer["wq"]).reshape(bq, t, h, hd)
            k = (x @ layer["wk"]).reshape(bq, t, h, hd)
            v = (x @ layer["wv"]).reshape(bq, t, h, hd)
            a = (q + k + v).reshape(bq, t, h * hd)  # keep all three live
            x = x + a @ layer["wo"]
            return x + (x @ layer["ff1_w"]) @ layer["ff2_w"]
        mod = jax.nn.silu(time_emb) @ layer["ada_w"] + layer["ada_b"]
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(mod, 6, axis=-1)
        if ada:
            normed = (_ln_noaffine(x) * (1 + scale_msa[:, None])
                      + shift_msa[:, None])
        else:
            normed = _ln_noaffine(x)
        if attn:
            look_back, look_ahead = lb_la
            a = _dit_attention_local(
                layer, normed, cos, sin, look_back, look_ahead,
                dcfg.block_size, dcfg.num_attention_heads, dcfg.head_dim,
                halfsplit=(args.attn_impl == "local_hs"))
            x = x + (gate_msa[:, None] * a if ada else a)
        else:
            x = x + normed  # keep the layer's residual structure live
        if ada:
            normed = (_ln_noaffine(x) * (1 + scale_mlp[:, None])
                      + shift_mlp[:, None])
        else:
            normed = _ln_noaffine(x)
        if ff:
            h = normed @ layer["ff1_w"] + layer["ff1_b"]
            h = jax.nn.gelu(h, approximate=True)
            h = h @ layer["ff2_w"] + layer["ff2_b"]
            x = x + (gate_mlp[:, None] * h if ada else h)
        return x

    def dit_sample_ab(dp, codes, ref_mel, xvector, key, *, num_steps=10,
                      guidance=0.5, attn=True, ff=True, ada=True,
                      matfloor=False, ropeoff=False):
        bsz, tc = codes.shape
        tm = tc * dcfg.repeats
        noise = jax.random.normal(key, (bsz, tm, dcfg.mel_dim), jnp.float32)
        spk_cfg = dcfg.spk_encoder_config()
        spk = speaker_encoder_forward(dp["spk_encoder"], spk_cfg, ref_mel)
        spk_rep = jnp.broadcast_to(spk[:, None], (bsz, tm, dcfg.enc_dim))
        xv_rep = jnp.broadcast_to(xvector[:, None], (bsz, tm, dcfg.enc_emb_dim))
        code_emb = jnp.repeat(dp["codec_embed"][codes], dcfg.repeats, axis=1)
        apply_cfg = guidance >= 1e-5
        if apply_cfg:
            spk0 = speaker_encoder_forward(
                dp["spk_encoder"], spk_cfg, jnp.zeros_like(ref_mel))
            spk0_rep = jnp.broadcast_to(spk0[:, None], (bsz, tm, dcfg.enc_dim))
            ce_u = jnp.repeat(
                dp["codec_embed"][jnp.zeros_like(codes)], dcfg.repeats, axis=1)
            mel_in = lambda x: jnp.concatenate([x, x], axis=0)  # noqa: E731
            spk2 = jnp.concatenate([spk_rep, spk0_rep], axis=0)
            xv2 = jnp.concatenate([xv_rep, jnp.zeros_like(xv_rep)], axis=0)
            ce2 = jnp.concatenate([code_emb, ce_u], axis=0)
        else:
            mel_in = lambda x: x  # noqa: E731
            spk2, xv2, ce2 = spk_rep, xv_rep, code_emb

        ts = jnp.linspace(0.0, 1.0, num_steps)
        ts = ts + (-1.0) * (jnp.cos(jnp.pi / 2 * ts) - 1 + ts)

        def forward(x, t0):
            dt = dp["in_proj_w"].dtype
            temb = _sinus_time_embedding(
                jnp.broadcast_to(t0, (ce2.shape[0],)), 256).astype(dt)
            temb = jax.nn.silu(temb @ dp["time_w1"] + dp["time_b1"])
            temb = temb @ dp["time_w2"] + dp["time_b2"]
            h = jnp.concatenate(
                [mel_in(x).astype(dt), spk2.astype(dt), ce2.astype(dt),
                 xv2.astype(dt)], axis=-1)
            h = h @ dp["in_proj_w"] + dp["in_proj_b"]
            if args.attn_impl == "local_hs":
                cos, sin = _halfsplit_rope_tables(
                    h.shape[1], dcfg.head_dim, dcfg.rope_theta)
                layers_ = [_rope_halfsplit_layer(
                    l, dcfg.num_attention_heads, dcfg.head_dim)
                    for l in dp["layers"]]
            else:
                cos, sin = _interleaved_rope_tables(
                    h.shape[1], dcfg.head_dim, dcfg.rope_theta)
                layers_ = dp["layers"]
            for i, layer in enumerate(layers_):
                la = 1 if i in dcfg.look_ahead_layers else 0
                lb = 1 if i in dcfg.look_backward_layers else 0
                h = dit_layer_ab(layer, h, temb, cos, sin, (lb, la),
                                 attn=attn, ff=ff, ada=ada, matfloor=matfloor,
                                 ropeoff=ropeoff)
            mod = jax.nn.silu(temb) @ dp["out_ada_w"] + dp["out_ada_b"]
            scale, shift = jnp.split(mod, 2, axis=-1)
            h = _ln_noaffine(h) * (1 + scale[:, None]) + shift[:, None]
            return (h @ dp["out_proj_w"] + dp["out_proj_b"]).astype(jnp.float32)

        def euler(x, tpair):
            t0, t1 = tpair
            pred = forward(x, t0)
            if apply_cfg:
                cond, uncond = jnp.split(pred, 2, axis=0)
                pred = cond + (cond - uncond) * guidance
            return x + pred * (t1 - t0), None

        x, _ = jax.lax.scan(euler, noise, (ts[:-1], ts[1:]))
        return x

    # ---- BigVGAN with component toggles ------------------------------------
    def bigvgan_ab(bp, mel, *, snake="full", max_stage=None):
        """snake: full | noaa | off | convfloor. ``max_stage`` truncates the
        upsample pyramid after stage k (convfloor per-stage attribution)."""
        filters = bp["_filters"]
        up_f, dn_f = filters["up"], filters["down"]

        def act(alpha, beta, h):
            if snake == "full":
                return _anti_aliased_snake(h, alpha, beta, up_f, dn_f)
            if snake == "noaa":
                return snake_beta(h, alpha, beta)
            return h  # off / convfloor

        h = _process_mel(mel).astype(bp["pre_w"].dtype)
        h = _conv1d_same(h, bp["pre_w"], bp["pre_b"])
        n_res = len(bcfg.resblock_kernel_sizes)
        from qwen_tts_tpu.ops.convs import causal_conv1d

        for li, rate in enumerate(bcfg.upsample_rates):
            if max_stage is not None and li > max_stage:
                return h[..., 0].astype(jnp.float32)
            h = _conv_transpose_same(
                h, bp["ups_w"][li], bp["ups_b"][li], stride=rate)
            acc = None
            for bi in range(n_res):
                blk = bp["resblocks"][li * n_res + bi]
                causal_type = "1" if li > 1 else "2"
                if snake == "full":
                    r = _amp_block(blk, h, bcfg.resblock_dilation_sizes[bi],
                                   causal_type, filters)
                else:
                    x_in = h
                    if causal_type == "2":
                        r0 = _conv1d_same(x_in, blk["pre_conv_w"],
                                          blk["pre_conv_b"])
                        r0 = act(blk["pre_alpha"], blk["pre_beta"], r0)
                    else:
                        r0 = x_in
                    out = x_in
                    for j, dil in enumerate(bcfg.resblock_dilation_sizes[bi]):
                        r0 = act(blk["act_alpha"][2 * j],
                                 blk["act_beta"][2 * j], r0)
                        r0 = causal_conv1d(r0, blk["conv1_w"][j],
                                           blk["conv1_b"][j], dilation=dil)
                        r0 = act(blk["act_alpha"][2 * j + 1],
                                 blk["act_beta"][2 * j + 1], r0)
                        if causal_type == "1":
                            r0 = _conv1d_same(r0, blk["conv2_w"][j],
                                              blk["conv2_b"][j])
                        else:
                            r0 = causal_conv1d(r0, blk["conv2_w"][j],
                                               blk["conv2_b"][j])
                        out = out + r0
                    r = out
                acc = r if acc is None else acc + r
            h = acc / n_res
        if snake == "full":
            h = _anti_aliased_snake(h, bp["post_alpha"], bp["post_beta"],
                                    up_f, dn_f)
        elif snake == "noaa":
            h = snake_beta(h, bp["post_alpha"], bp["post_beta"])
        wav = _conv1d_same(h, bp["post_w"], None)
        return jnp.clip(wav[..., 0].astype(jnp.float32), -1.0, 1.0)

    # ---- FLOPs model (useful MACs x2) --------------------------------------
    def dit_flops(width, steps, *, attn=True, ff=True):
        d, l = dcfg.hidden_size, dcfg.num_hidden_layers
        per_tok = 0
        if attn:
            per_tok += 4 * d * d  # QKVO
            per_tok += 2 * 3 * dcfg.block_size * d  # ~3-block local scores+av
        if ff:
            per_tok += 2 * d * (d * dcfg.ff_mult)
        return 2 * per_tok * l * width * t_mel * steps

    def bigvgan_flops():
        total = 0
        t = t_mel
        c = bcfg.upsample_initial_channel
        total += 2 * 7 * bcfg.mel_dim * c * t  # pre conv
        for li, rate in enumerate(bcfg.upsample_rates):
            k_up = bcfg.upsample_kernel_sizes[li]
            c_out = c // 2
            total += 2 * k_up * c * c_out * t  # tconv (k taps per input pos)
            t *= rate
            c = c_out
            for ks in bcfg.resblock_kernel_sizes:
                for _ in bcfg.resblock_dilation_sizes[0]:
                    total += 2 * 2 * ks * c * c * t  # conv1+conv2
            if li <= 1:  # causal_type "2" pre-conv per block
                for ks in bcfg.resblock_kernel_sizes:
                    total += 2 * ks * c * c * t
        total += 2 * 7 * c * 1 * t
        return total * b

    cfg_width = 2 * b  # CFG-doubled

    VARIANTS = {
        "full": dict(kind="pipe"),
        "dit_full": dict(kind="dit", kw={}, flops=dit_flops(cfg_width, 10)),
        "dit_nocfg": dict(kind="dit", kw=dict(guidance=0.0),
                          flops=dit_flops(b, 10)),
        "dit_noattn": dict(kind="dit", kw=dict(attn=False),
                           flops=dit_flops(cfg_width, 10, attn=False)),
        "dit_noff": dict(kind="dit", kw=dict(ff=False),
                         flops=dit_flops(cfg_width, 10, ff=False)),
        "dit_noada": dict(kind="dit", kw=dict(ada=False),
                          flops=dit_flops(cfg_width, 10)),
        "dit_matfloor": dict(kind="dit", kw=dict(matfloor=True),
                             flops=dit_flops(cfg_width, 10)),
        "dit_ropeoff": dict(kind="dit", kw=dict(ropeoff=True),
                            flops=dit_flops(cfg_width, 10)),
        "dit_steps5": dict(kind="dit", kw=dict(num_steps=5),
                           flops=dit_flops(cfg_width, 5)),
        "bv_full": dict(kind="bv", kw=dict(snake="full"),
                        flops=bigvgan_flops()),
        "bv_nosnake": dict(kind="bv", kw=dict(snake="off"),
                           flops=bigvgan_flops()),
        "bv_noaa": dict(kind="bv", kw=dict(snake="noaa"),
                        flops=bigvgan_flops()),
        "bv_convfloor": dict(kind="bv", kw=dict(snake="convfloor"),
                             flops=bigvgan_flops()),
        # Per-stage conv-floor attribution: marginal cost of upsample
        # stage k = bv_conv{k} - bv_conv{k-1} (channels 1536->24, T x5,3,2,2,2,2).
        **{f"bv_conv{k}": dict(kind="bv",
                               kw=dict(snake="convfloor", max_stage=k))
           for k in range(6)},
    }

    # One shared mel for the BigVGAN variants (from a single DiT run) so
    # vocoder programs don't recompute the DiT.
    mel_fn = jax.jit(lambda dp, c, r, x, k: dit_sample_ab(dp, c, r, x, k))
    mel = None

    results = {}
    audio_sec = b * t_codes * cfg.decode_upsample_rate / cfg.output_sample_rate
    for name in args.variants.split(","):
        spec = VARIANTS[name]
        if spec["kind"] == "pipe":
            fn = jax.jit(v1.codec_v1_decode, static_argnums=1)

            def run(seed, fn=fn):
                wav = fn(params, cfg, codes, xv, ref_mels,
                         jax.random.PRNGKey(seed))
                return float(jnp.sum(wav.astype(jnp.float32)))
        elif spec["kind"] == "dit":
            kw = spec["kw"]
            fn = jax.jit(lambda dp, c, r, x, k, kw=kw:
                         dit_sample_ab(dp, c, r, x, k, **kw))

            def run(seed, fn=fn):
                m = fn(params["dit"], codes, ref_mels, xv,
                       jax.random.PRNGKey(seed))
                return float(jnp.sum(m.astype(jnp.float32)))
        else:
            if mel is None:
                mel = mel_fn(params["dit"], codes, ref_mels, xv,
                             jax.random.PRNGKey(0))
                mel.block_until_ready()
            kw = spec["kw"]
            fn = jax.jit(lambda bp, m, kw=kw: bigvgan_ab(bp, m, **kw))

            def run(seed, fn=fn):
                w = fn(params["bigvgan"], mel)
                return float(jnp.sum(w.astype(jnp.float32)))

        print(f"[ablate] {name}: warmup…", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        run(0)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(args.runs):
            run(i + 1)
        wall = (time.perf_counter() - t0) / args.runs
        entry = {"ms": round(wall * 1e3, 1), "warmup_s": round(warm, 1)}
        if "flops" in spec:
            entry["model_tflops"] = round(spec["flops"] / 1e12, 2)
            entry["achieved_tf_s"] = round(spec["flops"] / wall / 1e12, 1)
        if spec["kind"] == "pipe":
            entry["rtf"] = round(audio_sec / wall, 1)
        results[name] = entry
        print(f"{name:14s} {entry['ms']:8.1f} ms"
              + (f"  {entry.get('achieved_tf_s', ''):>6} TF/s"
                 if "achieved_tf_s" in entry else ""))

    # Attribution summary (component = full - component-off).
    def diff(a, b_):
        if a in results and b_ in results:
            return round(results[a]["ms"] - results[b_]["ms"], 1)
        return None

    summary = {
        "dit_attention_ms": diff("dit_full", "dit_noattn"),
        "dit_ff_ms": diff("dit_full", "dit_noff"),
        "dit_adaln_ms": diff("dit_full", "dit_noada"),
        "dit_cfg_ms": diff("dit_full", "dit_nocfg"),
        "bv_activation_ms": diff("bv_full", "bv_nosnake"),
        "bv_aa_filter_ms": diff("bv_full", "bv_noaa"),
        "bv_conv_floor_ms": results.get("bv_convfloor", {}).get("ms"),
        "dit_matmul_floor_ms": results.get("dit_matfloor", {}).get("ms"),
    }
    payload = {"results": results, "summary": summary, "batch": b,
               "codes": t_codes, "t_mel": t_mel, "attn_impl": args.attn_impl}
    print(json.dumps(payload, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(payload, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
