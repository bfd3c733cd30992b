#!/usr/bin/env python3
"""HBM deployment-budget check — the TPU-native analog of the reference's
browser payload gate (scripts/wasm_check_model.py + Makefile
WASM_MODEL_MAX_MIB: walk the checkpoint index, enforce a hard byte budget
before shipping). On TPU the budget that matters is device HBM: weights
after the load-time dtype policy, KV caches at the serving shape, and the
codec decoder's activation peak. The b64→b96 serving cliff in round 2 was
exactly this check failing at runtime (18.75 GiB demanded vs 15.75 GiB) —
this script fails it at deploy time instead.

Reads only safetensors headers (no tensor data).

Usage:
  python scripts/check_hbm_budget.py --model-dir CKPT [--batch 32]
      [--max-new-tokens 2048] [--prefill 64] [--hbm-gib 15.75] [--serving]

Prints a JSON breakdown; exit 1 when over budget.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GIB = 1024 ** 3


def _tensor_bytes(st, prefix: str, bytes_per_elem: float) -> int:
    total = 0
    for k in st.keys():
        if k.startswith(prefix):
            _, shape = st.info(k)
            n = 1
            for d in shape:
                n *= d
            total += int(n * bytes_per_elem)
    return total


def estimate(model_dir: str, *, batch: int, max_new_tokens: int,
             prefill: int, serving: bool, kv_int8: bool = False) -> dict:
    from qwen_tts_tpu.config import TTSConfig
    from qwen_tts_tpu.io.safetensors import MultiSafeTensors

    cfg = TTSConfig.from_pretrained(model_dir)
    tk = cfg.talker
    cp = tk.code_predictor

    st = MultiSafeTensors(model_dir)
    try:
        # Load-time dtype policy (io/loader.py, mirroring c/qwen_tts.c:362-364):
        # talker/sub-talker bf16 (int8 for the trunks in serving mode), the
        # big embedding/head tables stay bf16 unless serving quantizes them.
        # Serving mode (quantize_for_serving) stores trunks + stacked
        # sub-talker tables int8 with per-channel f32 scales (~1.05 B/elem
        # effective); parity default keeps everything bf16.
        talker = _tensor_bytes(st, "talker.", 1.05 if serving else 2.0)
        spk = _tensor_bytes(st, "speaker_encoder.", 4.0)
    finally:
        st.close()

    codec = 0
    st_dir = os.path.join(model_dir, "speech_tokenizer")
    if os.path.isdir(st_dir) and any(
        f.endswith(".safetensors") for f in os.listdir(st_dir)
    ):
        cst = MultiSafeTensors(st_dir)
        try:
            codec = _tensor_bytes(cst, "", 2.0)  # bf16 serving default
        finally:
            cst.close()

    # KV caches at the serving shape (2 = K and V). kv_int8
    # (quantize_for_serving(kv=True)) stores int8 payload + one f32 scale per
    # (token, head): hd + 4 bytes per hd-vector instead of 2*hd.
    cache_len = prefill + max_new_tokens
    kv_vec_bytes = (tk.head_dim + 4) if kv_int8 else (tk.head_dim * 2)
    talker_kv = (2 * tk.num_hidden_layers * batch * cache_len
                 * tk.num_key_value_heads * kv_vec_bytes)
    # Sub-talker cache is G positions deep, alive only inside the micro-scan.
    sub_kv = (2 * cp.num_hidden_layers * batch * tk.num_code_groups
              * cp.num_key_value_heads * cp.head_dim * 2)

    # Codec decode activation peak: the widest live buffer is the final
    # upsample stages — batch × (frames × total_upsample) samples across the
    # last block's channels, with ~3 buffers live through a fusion boundary.
    dec = cfg.codec.decoder
    chunk = min(max_new_tokens, 300)  # chunked_decode bound (codec.py)
    last_ch = max(dec.decoder_dim // (2 ** len(dec.upsample_rates)), 32)
    act_peak = int(batch * chunk * cfg.codec.decode_upsample_rate
                   * last_ch * 2 * 3)

    total = talker + spk + codec + talker_kv + sub_kv + act_peak
    return {
        "weights_talker_bytes": talker,
        "weights_speaker_bytes": spk,
        "weights_codec_bytes": codec,
        "kv_talker_bytes": talker_kv,
        "kv_subtalker_bytes": sub_kv,
        "codec_activation_peak_bytes": act_peak,
        "total_bytes": total,
        "total_gib": round(total / GIB, 3),
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model-dir", required=True)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--max-new-tokens", type=int, default=2048)
    p.add_argument("--prefill", type=int, default=64)
    p.add_argument("--hbm-gib", type=float, default=15.75,
                   help="usable HBM budget (v5e chip default)")
    p.add_argument("--serving", action="store_true",
                   help="int8 serving dtype policy (quantize_for_serving)")
    p.add_argument("--kv-int8", action="store_true",
                   help="int8 talker KV cache (quantize_for_serving(kv=True))")
    args = p.parse_args()

    report = estimate(
        args.model_dir, batch=args.batch,
        max_new_tokens=args.max_new_tokens, prefill=args.prefill,
        serving=args.serving, kv_int8=args.kv_int8,
    )
    report["hbm_budget_gib"] = args.hbm_gib
    report["fits"] = report["total_gib"] <= args.hbm_gib
    print(json.dumps(report, indent=2))
    if not report["fits"]:
        print(
            f"OVER BUDGET: {report['total_gib']} GiB > {args.hbm_gib} GiB "
            f"— reduce --batch or --max-new-tokens",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
