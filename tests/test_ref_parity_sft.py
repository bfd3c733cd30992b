"""Reference-in-the-loop parity for the SFT data layout.

The ACTUAL reference collate (finetuning/dataset.py:146-217) runs on the
fixture config and its batch must reproduce this framework's collate
bit-exactly: fused input embeddings (text track + codec track + Σ group
embeds, live speaker slot 6), attention mask, codebook-0 labels, per-frame
group labels, and the frame mask — all after the train-time shift
(embeds[:-1] / labels[1:], sft_12hz.py:103-106).

Two genuine reference-SFT quirks are deliberately NOT replicated (both
contradict the model's own inference-time conditioning; documented here
with citations, asserted below so a future change re-surfaces them):

1. sft_12hz.py:89 embeds the text track via the RAW text_embedding without
   the text_projection MLP — that only type-checks when text_hidden_size ==
   hidden_size (the 1.7B default 2048 vs 1024 would crash), while inference
   always projects (modeling_qwen3_tts.py:2201). Our collate projects.
2. sft_12hz.py:103-106 passes inputs_embeds[:, :-1] with labels[:, 1:] to
   the talker, whose HF loss_function (transformers ForCausalLMLoss,
   modeling_qwen3_tts.py:1731) shifts AGAIN — the talker CE effectively
   pairs hidden(p) with the token at p+2, even though the same script's
   sub-talker pairing (sft_12hz.py:108-110) and the decode loop condition
   hidden(p) on the token at p+1. Our loss shifts once, consistently with
   the sub-talker term and inference.
"""

import json
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from ckpt_fixture import make_checkpoint
from ref_oracle import REF_ROOT, install_ref_stubs
from qwen_tts_tpu.io.loader import load_checkpoint
from qwen_tts_tpu.models import talker as talker_mod
from qwen_tts_tpu.training.data import SFTExample, collate


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sft_ref_ckpt"))
    cfg = make_checkpoint(d)
    cfgs, talker_params, st_params, _codec, _extra = load_checkpoint(
        d, talker_dtype=jnp.float32
    )
    install_ref_stubs()
    for p in (REF_ROOT, os.path.join(REF_ROOT, "finetuning")):
        if p not in sys.path:
            sys.path.insert(0, p)
    from dataset import TTSDataset
    from qwen_tts.core.models.configuration_qwen3_tts import Qwen3TTSConfig

    with open(os.path.join(d, "config.json")) as f:
        ref_cfg = Qwen3TTSConfig(**json.load(f))
    ds = TTSDataset([], processor=None, config=ref_cfg)
    return cfgs, talker_params, st_params, ds


def _examples(cfg, rng):
    g = cfg.talker.num_code_groups
    out = []
    for i, tl in enumerate((6, 8)):
        out.append(SFTExample(
            text_ids=np.concatenate([
                [1, 2, 3],
                rng.integers(10, 40, tl - 3),
            ]).astype(np.int64),
            audio_codes=rng.integers(
                0, cfg.talker.vocab_size // 2, (4 + i, g)
            ).astype(np.int64),
            speaker_embedding=rng.standard_normal(
                cfg.talker.hidden_size
            ).astype(np.float32),
        ))
    return out


def test_collate_matches_reference_collate(stack):
    cfgs, talker_params, st_params, ds = stack
    rng = np.random.default_rng(11)
    examples = _examples(cfgs, rng)

    ours = collate(examples, cfgs, talker_params, st_params)

    def pad16(codes):
        # The reference collate hard-codes the 16-group layout
        # (dataset.py:155); the tiny fixture runs fewer groups.
        out = torch.zeros((codes.shape[0], 16), dtype=torch.long)
        out[:, : codes.shape[1]] = torch.as_tensor(codes)
        return out

    ref_batch = ds.collate_fn([
        {
            "text_ids": torch.as_tensor(e.text_ids).view(1, -1),
            "audio_codes": pad16(e.audio_codes),
            "ref_mel": torch.zeros((1, 2, 4)),  # unused: spk is injected
        }
        for e in examples
    ])

    # ---- label/mask layout (post the train-time shift) -------------------
    np.testing.assert_array_equal(
        np.asarray(ours.codec0_labels),
        ref_batch["codec_0_labels"][:, 1:].numpy(),
    )
    np.testing.assert_array_equal(
        np.asarray(ours.pad_mask),
        ref_batch["attention_mask"][:, :-1].numpy().astype(bool),
    )
    np.testing.assert_array_equal(
        np.asarray(ours.frame_mask),
        ref_batch["codec_mask"][:, 1:].numpy(),
    )
    g = cfgs.talker.num_code_groups
    np.testing.assert_array_equal(
        np.asarray(ours.group_labels),
        ref_batch["codec_ids"][:, 1:, :g].numpy(),
    )

    # ---- fused embeddings ------------------------------------------------
    # Rebuild them from the REFERENCE batch with this framework's embedding
    # tables (text track projected — deliberate deviation #1 above applied
    # identically on both sides, so any difference left is pure layout).
    text_ids = ref_batch["input_ids"][:, :, 0].numpy()
    codec_ids0 = ref_batch["input_ids"][:, :, 1].numpy()
    text_emb = (
        np.asarray(talker_mod.embed_text(talker_params, jnp.asarray(text_ids)))
        * ref_batch["text_embedding_mask"].numpy()
    )
    codec_emb = (
        np.asarray(talker_params["codec_embedding"])[codec_ids0]
        * ref_batch["codec_embedding_mask"].numpy()
    )
    codec_emb[:, 6, :] = np.stack([e.speaker_embedding for e in examples])
    fused = text_emb + codec_emb
    frame = ref_batch["codec_mask"].numpy()[..., None]
    embeds = np.asarray(st_params["embeds"])
    for gi in range(1, g):
        fused = fused + embeds[gi - 1][
            ref_batch["codec_ids"][:, :, gi].numpy()
        ] * frame
    np.testing.assert_allclose(
        np.asarray(ours.inputs_embeds), fused[:, :-1], rtol=0, atol=1e-6
    )


def test_reference_sft_quirks_still_present(stack):
    """Pin the two documented upstream quirks so a reference change (or a
    misreading on our side) re-surfaces them."""
    # (1) raw text_embedding in the SFT script: grep-level pin.
    src = open(os.path.join(REF_ROOT, "finetuning", "sft_12hz.py")).read()
    assert "model.talker.model.text_embedding(input_text_ids)" in src
    assert "text_projection" not in src
    # (2a) the script already shifts at the call site…
    assert "inputs_embeds=input_embeddings[:, :-1" in src or (
        "input_embeddings[:, :-1, :]" in src
    )
    assert "labels=codec_0_labels[:, 1:]" in src
    # (2b) …and the talker's HF loss (ForCausalLMLoss) shifts AGAIN: it
    # pairs logits position p with labels[p+1], not labels[p]. Identity
    # pairing would score position 0's confident class-4 against label 5
    # (huge loss); the internal shift scores it against labels[1] = 4.
    from transformers.loss.loss_utils import ForCausalLMLoss

    logits = torch.zeros((1, 3, 8))
    logits[0, 0, 4] = 100.0
    labels = torch.tensor([[5, 4, -100]])
    loss = ForCausalLMLoss(logits=logits, labels=labels, vocab_size=8)
    assert loss.item() < 0.01
