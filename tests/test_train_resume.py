"""Train-state checkpoint/resume (training/checkpoint.py).

The reference has no training resume (finetuning/sft_12hz.py only exports
finished model checkpoints); ours must make an interrupted run continuable
with NO trace of the interruption: 2 steps + save + restore-into-fresh-state
+ 2 steps must equal 4 straight steps bit-for-bit (f32 CPU determinism)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qwen_tts_tpu.config import tiny_tts_config
from qwen_tts_tpu.models import subtalker as st_mod
from qwen_tts_tpu.models import talker as talker_mod
from qwen_tts_tpu.training.checkpoint import load_train_state, save_train_state
from qwen_tts_tpu.training.sft import SFTBatch, make_train_step


def _setup():
    cfg = tiny_tts_config().talker
    rng = jax.random.PRNGKey(0)
    talker = talker_mod.init_talker_params(rng, cfg)
    st = st_mod.init_subtalker_params(
        jax.random.fold_in(rng, 1), cfg.code_predictor, cfg.hidden_size
    )
    params = {"talker": talker, "subtalker": st}
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    return cfg, params, tx


def _batches(cfg, n, b=2, s=6):
    g = cfg.num_code_groups
    out = []
    for i in range(n):
        r = np.random.default_rng(i)
        out.append(SFTBatch(
            inputs_embeds=jnp.asarray(
                r.standard_normal((b, s, cfg.hidden_size)).astype(np.float32)),
            pad_mask=jnp.ones((b, s), bool),
            codec0_labels=jnp.asarray(
                r.integers(0, cfg.vocab_size, (b, s)).astype(np.int32)),
            group_labels=jnp.asarray(
                r.integers(0, cfg.code_predictor.vocab_size,
                           (b, s, g)).astype(np.int32)),
            frame_mask=jnp.ones((b, s), bool),
        ))
    return out


def test_resume_is_bit_identical_to_uninterrupted_run(tmp_path):
    cfg, params0, tx = _setup()
    train_step = make_train_step(cfg, tx)
    batches = _batches(cfg, 4)

    # Uninterrupted: 4 steps.
    p, o = params0, tx.init(params0)
    for bt in batches:
        p, o, loss_a, _ = train_step(p, o, bt)

    # Interrupted: 2 steps, snapshot, restore into a FRESH template, 2 steps.
    p2, o2 = params0, tx.init(params0)
    for bt in batches[:2]:
        p2, o2, _, _ = train_step(p2, o2, bt)
    ckpt = save_train_state(str(tmp_path / "ck"), p2, o2, step=2, epoch=1,
                            extra={"lr": 1e-3})
    _, fresh_params, _ = _setup()  # same seed => same template struct/shapes
    rp, ro, meta = load_train_state(ckpt, fresh_params, tx)
    assert meta["step"] == 2 and meta["epoch"] == 1 and meta["lr"] == 1e-3
    for bt in batches[2:]:
        rp, ro, loss_b, _ = train_step(rp, ro, bt)

    assert float(loss_a) == float(loss_b), (
        f"resumed run diverged: {float(loss_b)} != {float(loss_a)}"
    )
    for a, b in zip(jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(rp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_rejects_mismatched_architecture(tmp_path):
    cfg, params, tx = _setup()
    ckpt = save_train_state(str(tmp_path / "ck"), params, tx.init(params),
                            step=0)
    # A different hidden size is a different pytree of shapes — restoring
    # into it must hard-fail, not silently mix states.
    cfg2 = dataclasses.replace(tiny_tts_config().talker, hidden_size=48)
    rng = jax.random.PRNGKey(0)
    talker2 = talker_mod.init_talker_params(rng, cfg2)
    st2 = st_mod.init_subtalker_params(
        jax.random.fold_in(rng, 1), cfg2.code_predictor, cfg2.hidden_size
    )
    with pytest.raises(Exception):
        load_train_state(ckpt, {"talker": talker2, "subtalker": st2}, tx)
