#!/usr/bin/env python3
"""SFT driver: Base → CustomVoice finetuning (the reference's
finetuning/sft_12hz.py as a JAX/optax loop over the pjit-shardable train step).

Data: JSONL rows with "text", "audio_codes" (from scripts/prepare_data.py) and
optionally "ref_audio" (for the live speaker embedding) — reference layout.

Usage:
  python scripts/sft_12hz.py --model-path BASE_CKPT --data train.jsonl \
      --output-model-path out/ --speaker-name myvoice [--lr 5e-5]
      [--num-epochs 2] [--batch-size 2]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--output-model-path", required=True)
    p.add_argument("--speaker-name", required=True)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--num-epochs", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--resume", default=None, metavar="STATE_DIR",
                   help="resume from a train-state snapshot "
                        "(written to OUTPUT/train_state each epoch)")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel mesh axis (0 = single device)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel mesh axis (colwise/rowwise plan)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="checkpoint trunk layers in the backward pass "
                        "(lower peak memory, ~1/3 extra forward FLOPs; "
                        "identical loss/gradients)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from qwen_tts_tpu.io.loader import load_checkpoint
    from qwen_tts_tpu.io.saver import save_finetuned_checkpoint
    from qwen_tts_tpu.pipeline import Qwen3TTSModel
    from qwen_tts_tpu.training.data import collate, examples_from_jsonl
    from qwen_tts_tpu.training.sft import make_train_step

    # Train in f32 (master weights); export back to bf16-compatible layout.
    cfg, talker, subtalker, _codec, speaker_enc = load_checkpoint(
        args.model_path, talker_dtype=jnp.float32
    )
    model = Qwen3TTSModel.from_pretrained(
        args.model_path, talker_dtype=jnp.float32
    )
    examples = examples_from_jsonl(
        args.data, model.tokenizer, Qwen3TTSModel.build_assistant_text
    )
    # (rows carrying pre-tokenized "text_ids" need no HF tokenizer;
    # examples_from_jsonl raises when a "text" row finds none)
    print(f"{len(examples)} training examples")

    # Live speaker embedding per example (sft_12hz.py:82-84): extract from
    # ref audio when provided, else use any precomputed embedding field.
    target_speaker_embedding = None
    for e in examples:
        if e.speaker_embedding is not None and target_speaker_embedding is None:
            target_speaker_embedding = e.speaker_embedding

    # Optional ("dp","tp") mesh: params sharded per the realized TP plan
    # (colwise/rowwise, parallel/mesh.py), batches sharded over dp. On a pod,
    # run under init_multihost() and the same mesh lays dp over DCN.
    mesh = None
    dp = max(args.dp, 1)
    if args.dp or args.tp > 1:
        from qwen_tts_tpu.parallel.mesh import (
            batch_sharding,
            make_mesh,
            shard_params,
        )

        mesh = make_mesh(dp * args.tp, tp=args.tp)
        talker, subtalker = shard_params(mesh, talker, subtalker)
        print(f"mesh: dp={dp} tp={args.tp} over {dp * args.tp} devices")

    params = {"talker": talker, "subtalker": subtalker}
    tx = optax.chain(
        optax.clip_by_global_norm(args.grad_clip),
        optax.adamw(args.lr, weight_decay=0.01),
    )
    opt_state = tx.init(params)
    train_step = make_train_step(cfg.talker, tx, remat=args.remat)

    def shard_batch(batch):
        """Pad rows to a dp multiple (fully-masked rows are loss-neutral:
        the CE is mask-normalized) and lay the batch over the dp axis."""
        if mesh is None:
            return batch
        n = (-batch.pad_mask.shape[0]) % dp
        if n:
            def pad(x, fill):
                ext = np.full((n,) + x.shape[1:], fill, np.asarray(x).dtype)
                return np.concatenate([np.asarray(x), ext], axis=0)

            batch = type(batch)(
                inputs_embeds=pad(batch.inputs_embeds, 0),
                pad_mask=pad(batch.pad_mask, False),
                codec0_labels=pad(batch.codec0_labels, -100),
                group_labels=pad(batch.group_labels, 0),
                frame_mask=pad(batch.frame_mask, False),
            )
        return type(batch)(*[
            jax.device_put(np.asarray(x), batch_sharding(mesh, np.ndim(x)))
            for x in batch
        ])

    from qwen_tts_tpu.training.checkpoint import (
        load_train_state,
        save_train_state,
    )

    step, start_epoch = 0, 0
    if args.resume:
        params, opt_state, meta = load_train_state(args.resume, params, tx)
        step, start_epoch = meta["step"], meta["epoch"]
        print(f"resumed from {args.resume} (epoch {start_epoch}, step {step})")

    for epoch in range(start_epoch, args.num_epochs):
        order = np.random.default_rng(epoch).permutation(len(examples))
        for i in range(0, len(order), args.batch_size):
            batch_ex = [examples[j] for j in order[i : i + args.batch_size]]
            batch = collate(batch_ex, cfg, params["talker"], params["subtalker"])
            batch = shard_batch(batch)
            params, opt_state, loss, aux = train_step(params, opt_state, batch)
            if step % 10 == 0:
                print(f"epoch {epoch} | step {step} | "
                      f"loss {float(loss):.4f} "
                      f"(talker {float(aux['talker_ce']):.4f}, "
                      f"subtalker {float(aux['subtalker_ce']):.4f})")
            step += 1

        out_dir = os.path.join(args.output_model_path,
                               f"checkpoint-epoch-{epoch}")
        save_finetuned_checkpoint(
            args.model_path, out_dir, params["talker"], params["subtalker"],
            speaker_name=args.speaker_name,
            speaker_embedding=target_speaker_embedding,
            speaker_slot=min(3000, cfg.talker.vocab_size - 1),
        )
        print(f"saved {out_dir}")
        # Resumable train state (params + optimizer + counters): the export
        # above is the *inference* checkpoint; this snapshot is what
        # --resume restarts from after an interruption.
        state_dir = os.path.join(args.output_model_path, "train_state")
        save_train_state(state_dir, params, opt_state,
                         step=step, epoch=epoch + 1)
        print(f"saved train state {state_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
