"""SFT data pipeline: JSONL examples → fused dual-track training batches.

Replicates the reference collate layout exactly (finetuning/dataset.py
collate_fn):

  pos 0..2   role text ids                       (text track only)
  pos 3..6   tts_pad ×4 on text; [nothink, think_bos, think_eos, <spk>] codec
  pos 7      tts_bos  +  codec_pad
  pos 8..    text ids[3:]  +  codec_pad
  ...        tts_eos  +  codec_pad
  ...        tts_pad  +  codec_bos
  ...        tts_pad  +  codec frames (Σ of group embeds)   ← supervised
  last       codec EOS label

Position 6 carries the live speaker embedding (injected, not a token —
sft_12hz.py:89-91). Labels are the next-position codebook-0 ids (-100
elsewhere) plus a final EOS label; sub-talker supervision pairs position t's
hidden with frame t+1's group ids, exactly like inference conditioning.
"""

from __future__ import annotations

import dataclasses
import json
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from qwen_tts_tpu.config import TTSConfig
from qwen_tts_tpu.models import talker as talker_mod
from qwen_tts_tpu.training.sft import SFTBatch


@dataclasses.dataclass
class SFTExample:
    text_ids: np.ndarray     # [T_text] chat-template ids, already trimmed of
                             # the trailing 5 template ids (dataset.py returns
                             # text_ids[:, :-5])
    audio_codes: np.ndarray  # [T_frames, G] codec ids
    speaker_embedding: Optional[np.ndarray] = None  # [D] x-vector (else zeros)


def load_jsonl(path: str) -> List[dict]:
    rows = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def collate(
    examples: Sequence[SFTExample],
    cfg: TTSConfig,
    talker_params: dict,
    st_params: dict,
) -> SFTBatch:
    """Build a fused-embedding SFTBatch (the embedding sums run in jnp so the
    result is ready for the jitted train step)."""
    tk = cfg.talker
    g = tk.num_code_groups
    d = tk.hidden_size
    lengths = [8 + (e.text_ids.shape[0] - 3) + e.audio_codes.shape[0] + 1
               for e in examples]
    # Reference width: max(text_len + codes_len) + 8 (dataset.py:149-150);
    # lengths[i] == text_len + codes_len + 6, so +2 lands exactly there.
    t_max = max(lengths) + 2
    b = len(examples)

    text_ids = np.zeros((b, t_max), np.int64)
    codec_ids0 = np.zeros((b, t_max), np.int64)
    text_mask = np.zeros((b, t_max, 1), np.float32)
    codec_mask_emb = np.zeros((b, t_max, 1), np.float32)
    frame_codes = np.zeros((b, t_max, g), np.int64)
    frame_mask = np.zeros((b, t_max), bool)
    attention = np.zeros((b, t_max), bool)
    labels = np.full((b, t_max), -100, np.int64)
    spk = np.zeros((b, d), np.float32)

    for i, e in enumerate(examples):
        tids = np.asarray(e.text_ids, np.int64)
        codes = np.asarray(e.audio_codes, np.int64)[:, :g]
        tl = tids.shape[0]
        cl = codes.shape[0]

        # text track
        text_ids[i, :3] = tids[:3]
        text_ids[i, 3:7] = cfg.tts_pad_token_id
        text_ids[i, 7] = cfg.tts_bos_token_id
        text_ids[i, 8 : 8 + tl - 3] = tids[3:]
        text_ids[i, 8 + tl - 3] = cfg.tts_eos_token_id
        text_ids[i, 8 + tl - 2 : 8 + tl + cl] = cfg.tts_pad_token_id
        text_mask[i, : 8 + tl + cl] = 1.0

        # codec track
        codec_ids0[i, 3:8] = [tk.codec_nothink_id, tk.codec_think_bos_id,
                              tk.codec_think_eos_id, 0, tk.codec_pad_id]
        codec_ids0[i, 8 : 8 + tl - 2] = tk.codec_pad_id
        codec_ids0[i, 8 + tl - 2] = tk.codec_bos_id
        codec_ids0[i, 8 + tl - 1 : 8 + tl - 1 + cl] = codes[:, 0]
        # Final attended position carries codec EOS as input (dataset.py:193);
        # its output is unsupervised, but the layout matches bit-exactly.
        codec_ids0[i, 8 + tl - 1 + cl] = tk.codec_eos_token_id
        codec_mask_emb[i, 3 : 8 + tl + cl] = 1.0
        codec_mask_emb[i, 6] = 0.0  # speaker-embedding slot

        labels[i, 8 + tl - 1 : 8 + tl - 1 + cl] = codes[:, 0]
        labels[i, 8 + tl - 1 + cl] = tk.codec_eos_token_id

        frame_codes[i, 8 + tl - 1 : 8 + tl - 1 + cl] = codes
        frame_mask[i, 8 + tl - 1 : 8 + tl - 1 + cl] = True
        attention[i, : 8 + tl + cl] = True
        if e.speaker_embedding is not None:
            spk[i] = e.speaker_embedding

    # Fused embeddings (sft_12hz.py:86-97): text + codec-0 + Σ group embeds.
    emb_dtype = jnp.float32
    text_emb = (
        talker_mod.embed_text(talker_params, jnp.asarray(text_ids)).astype(emb_dtype)
        * jnp.asarray(text_mask)
    )
    codec_emb = (
        talker_mod.embed_codec(talker_params, jnp.asarray(codec_ids0)).astype(emb_dtype)
        * jnp.asarray(codec_mask_emb)
    )
    codec_emb = codec_emb.at[:, 6, :].set(jnp.asarray(spk))
    inputs = text_emb + codec_emb
    fm = jnp.asarray(frame_mask)[..., None].astype(emb_dtype)
    for gi in range(1, g):
        inputs = inputs + (
            st_params["embeds"][gi - 1][jnp.asarray(frame_codes[:, :, gi])]
            .astype(emb_dtype) * fm
        )

    # Shift: model sees positions [:-1], predicts labels [1:]. The sub-talker
    # pairs position t's hidden with frame t+1's groups.
    return SFTBatch(
        inputs_embeds=inputs[:, :-1],
        pad_mask=jnp.asarray(attention[:, :-1]),
        codec0_labels=jnp.asarray(labels[:, 1:]).astype(jnp.int32),
        group_labels=jnp.asarray(frame_codes[:, 1:]).astype(jnp.int32),
        frame_mask=jnp.asarray(frame_mask[:, 1:]),
    )


def examples_from_jsonl(
    path: str, tokenizer, build_assistant_text
) -> List[SFTExample]:
    """Reference JSONL layout (finetuning/dataset.py __getitem__): fields
    "text", "audio_codes" (from prepare_data), optional "speaker_embedding".
    Rows may instead carry pre-tokenized "text_ids" (already template-trimmed,
    dataset.py:141 semantics) — the tokenizer-free path, mirroring the CLI's
    pre-tokenized-ids surface."""
    rows = load_jsonl(path)
    out = []
    for row in rows:
        if "text_ids" in row:
            ids = np.asarray(row["text_ids"], np.int64)
        else:
            if tokenizer is None:
                raise ValueError(
                    "row has no 'text_ids' and no tokenizer is available"
                )
            ids = np.asarray(
                tokenizer(build_assistant_text(row["text"]))["input_ids"],
                np.int64,
            )[:-5]
        out.append(SFTExample(
            text_ids=ids,
            audio_codes=np.asarray(row["audio_codes"], np.int64),
            speaker_embedding=(
                np.asarray(row["speaker_embedding"], np.float32)
                if "speaker_embedding" in row else None
            ),
        ))
    return out
