"""Checkpoint export: parameter pytrees → reference-format safetensors.

Reverses the loader's layout transforms (io/loader.py) so finetuned weights
written here load in any reference-compatible runtime — the same contract the
reference SFT keeps (finetuning/sft_12hz.py:126-158: copy base dir, patch
config, save_file of the state dict)."""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, Optional

import numpy as np

from qwen_tts_tpu.config import TTSConfig


def _np16(x) -> np.ndarray:
    """To numpy, bf16 → uint16-viewed bf16 for safetensors ('BF16')."""
    import ml_dtypes

    arr = np.asarray(x)
    if arr.dtype == np.dtype(ml_dtypes.bfloat16):
        return arr
    return arr


def _lin(w) -> np.ndarray:
    """[in, out] → torch [out, in]."""
    return np.ascontiguousarray(np.asarray(w).T)


def export_talker_state(talker: dict, subtalker: dict) -> Dict[str, np.ndarray]:
    t: Dict[str, np.ndarray] = {}
    t["talker.model.codec_embedding.weight"] = np.asarray(talker["codec_embedding"])
    t["talker.model.text_embedding.weight"] = np.asarray(talker["text_embedding"])
    t["talker.text_projection.linear_fc1.weight"] = _lin(talker["text_proj_fc1"])
    t["talker.text_projection.linear_fc1.bias"] = np.asarray(talker["text_proj_fc1_b"])
    t["talker.text_projection.linear_fc2.weight"] = _lin(talker["text_proj_fc2"])
    t["talker.text_projection.linear_fc2.bias"] = np.asarray(talker["text_proj_fc2_b"])
    t["talker.model.norm.weight"] = np.asarray(talker["norm"])
    t["talker.codec_head.weight"] = _lin(talker["codec_head"])

    def dump_trunk(prefix: str, trunk: dict):
        L = np.asarray(trunk["wq"]).shape[0]
        for l in range(L):
            p = f"{prefix}.layers.{l}."
            t[p + "self_attn.q_proj.weight"] = _lin(trunk["wq"][l])
            t[p + "self_attn.k_proj.weight"] = _lin(trunk["wk"][l])
            t[p + "self_attn.v_proj.weight"] = _lin(trunk["wv"][l])
            t[p + "self_attn.o_proj.weight"] = _lin(trunk["wo"][l])
            t[p + "self_attn.q_norm.weight"] = np.asarray(trunk["q_norm"][l])
            t[p + "self_attn.k_norm.weight"] = np.asarray(trunk["k_norm"][l])
            t[p + "input_layernorm.weight"] = np.asarray(trunk["input_norm"][l])
            t[p + "post_attention_layernorm.weight"] = np.asarray(
                trunk["post_attn_norm"][l]
            )
            t[p + "mlp.gate_proj.weight"] = _lin(trunk["gate"][l])
            t[p + "mlp.up_proj.weight"] = _lin(trunk["up"][l])
            t[p + "mlp.down_proj.weight"] = _lin(trunk["down"][l])

    dump_trunk("talker.model", talker["trunk"])
    dump_trunk("talker.code_predictor.model", subtalker["trunk"])
    t["talker.code_predictor.model.norm.weight"] = np.asarray(subtalker["norm"])
    g1 = np.asarray(subtalker["embeds"]).shape[0]
    for i in range(g1):
        t[f"talker.code_predictor.model.codec_embedding.{i}.weight"] = np.asarray(
            subtalker["embeds"][i]
        )
        t[f"talker.code_predictor.lm_head.{i}.weight"] = _lin(
            subtalker["lm_heads"][i]
        )
    if "input_proj" in subtalker:
        t["talker.code_predictor.small_to_mtp_projection.weight"] = _lin(
            subtalker["input_proj"]
        )
        t["talker.code_predictor.small_to_mtp_projection.bias"] = np.asarray(
            subtalker["input_proj_b"]
        )
    return t


def save_finetuned_checkpoint(
    base_dir: str,
    output_dir: str,
    talker: dict,
    subtalker: dict,
    *,
    speaker_name: str,
    speaker_embedding: Optional[np.ndarray] = None,
    speaker_slot: int = 3000,
) -> None:
    """Reference SFT save semantics (sft_12hz.py:126-158): copy the base
    checkpoint dir, patch config (custom_voice + spk_id slot), bake the target
    speaker embedding into codec_embedding[slot], write model.safetensors."""
    from safetensors.numpy import save_file

    os.makedirs(output_dir, exist_ok=True)
    shutil.copytree(base_dir, output_dir, dirs_exist_ok=True)

    cfg_path = os.path.join(output_dir, "config.json")
    with open(cfg_path, encoding="utf-8") as f:
        cfg = json.load(f)
    cfg["tts_model_type"] = "custom_voice"
    talker_cfg = cfg.get("talker_config", {})
    talker_cfg["spk_id"] = {speaker_name: speaker_slot}
    talker_cfg["spk_is_dialect"] = {speaker_name: False}
    cfg["talker_config"] = talker_cfg
    with open(cfg_path, "w", encoding="utf-8") as f:
        json.dump(cfg, f, indent=2, ensure_ascii=False)

    state = export_talker_state(talker, subtalker)
    if speaker_embedding is not None:
        emb = state["talker.model.codec_embedding.weight"].copy()
        emb[speaker_slot] = np.asarray(speaker_embedding, emb.dtype)
        state["talker.model.codec_embedding.weight"] = emb

    # Drop any stale sharded files; write a single shard.
    for f in os.listdir(output_dir):
        if f.endswith(".safetensors") or f.endswith(".safetensors.index.json"):
            os.unlink(os.path.join(output_dir, f))
    save_file(state, os.path.join(output_dir, "model.safetensors"))
