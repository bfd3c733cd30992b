"""SFT pipeline: collate layout, train step, checkpoint export round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from ckpt_fixture import make_checkpoint
from qwen_tts_tpu.io.loader import load_checkpoint
from qwen_tts_tpu.io.saver import save_finetuned_checkpoint
from qwen_tts_tpu.pipeline import Qwen3TTSModel
from qwen_tts_tpu.training.data import SFTExample, collate
from qwen_tts_tpu.training.sft import make_train_step, sft_loss


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("sft_ckpt")
    cfg = make_checkpoint(str(d))
    return str(d), cfg


def _examples(cfg, n=2):
    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        tl = 5 + i
        out.append(SFTExample(
            text_ids=np.concatenate([[1, 2, 3],
                                     rng.integers(10, 100, tl)]).astype(np.int64),
            audio_codes=rng.integers(
                0, cfg.talker.code_predictor.vocab_size,
                (6 + i, cfg.talker.num_code_groups)
            ).astype(np.int64),
            speaker_embedding=rng.standard_normal(
                cfg.talker.hidden_size
            ).astype(np.float32),
        ))
    return out


def test_collate_layout(ckpt):
    model_dir, cfg = ckpt
    _, talker, st, _, _ = load_checkpoint(model_dir, talker_dtype=jnp.float32)
    exs = _examples(cfg)
    batch = collate(exs, cfg, talker, st)
    b, t, d = batch.inputs_embeds.shape
    assert b == 2 and d == cfg.talker.hidden_size
    # Labels: each row has cl codec labels + 1 EOS label.
    for i, e in enumerate(exs):
        lbl = np.asarray(batch.codec0_labels[i])
        valid = lbl[lbl != -100]
        assert valid.shape[0] == e.audio_codes.shape[0] + 1
        assert valid[-1] == cfg.talker.codec_eos_token_id
        np.testing.assert_array_equal(valid[:-1], e.audio_codes[:, 0])
        assert np.asarray(batch.frame_mask[i]).sum() == e.audio_codes.shape[0]


def test_train_step_reduces_loss(ckpt):
    model_dir, cfg = ckpt
    _, talker, st, _, _ = load_checkpoint(model_dir, talker_dtype=jnp.float32)
    params = {"talker": talker, "subtalker": st}
    batch = collate(_examples(cfg), cfg, talker, st)

    loss0, aux = sft_loss(params, cfg.talker, batch)
    assert np.isfinite(float(loss0))
    assert float(aux["talker_ce"]) > 0 and float(aux["subtalker_ce"]) > 0

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    step = make_train_step(cfg.talker, tx)
    opt_state = tx.init(params)
    loss_prev = float(loss0)
    for _ in range(5):
        params, opt_state, loss, _ = step(params, opt_state, batch)
    assert float(loss) < loss_prev  # overfits the fixed batch


def test_save_and_reload_finetuned(ckpt, tmp_path):
    model_dir, cfg = ckpt
    _, talker, st, _, _ = load_checkpoint(model_dir, talker_dtype=jnp.float32)
    spk_emb = np.random.default_rng(1).standard_normal(
        cfg.talker.hidden_size
    ).astype(np.float32)
    out = str(tmp_path / "ft")
    slot = cfg.talker.vocab_size - 2
    save_finetuned_checkpoint(
        model_dir, out, talker, st, speaker_name="myvoice",
        speaker_embedding=spk_emb, speaker_slot=slot,
    )
    model = Qwen3TTSModel.from_pretrained(out, talker_dtype=jnp.float32,
                                          load_tokenizer=False)
    assert model.get_supported_speakers() == ["myvoice"]
    assert model.cfg.tts_model_type == "custom_voice"
    np.testing.assert_allclose(
        np.asarray(model.talker_params["codec_embedding"][slot]), spk_emb,
        atol=1e-6,
    )
    # Round-trip: every other weight identical.
    np.testing.assert_allclose(
        np.asarray(model.talker_params["trunk"]["wq"]),
        np.asarray(talker["trunk"]["wq"]), atol=1e-6,
    )


def test_remat_train_step_matches_plain(ckpt):
    """make_train_step(remat=True) checkpoints every trunk layer in the
    backward pass — a memory/FLOPs trade that must not change training
    semantics: same math, values equal within float reassociation (the
    checkpointed backward is a different fused XLA program, so bit
    equality is NOT guaranteed — measured ~5e-8 relative on the loss)."""
    model_dir, cfg = ckpt
    _, talker, st, _, _ = load_checkpoint(model_dir, talker_dtype=jnp.float32)
    batch = collate(_examples(cfg), cfg, talker, st)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))

    results = {}
    for name, remat in (("plain", False), ("remat", True)):
        params = jax.tree_util.tree_map(
            jnp.array, {"talker": talker, "subtalker": st})
        step = make_train_step(cfg.talker, tx, remat=remat)
        opt_state = tx.init(params)
        losses = []
        for _ in range(3):
            params, opt_state, loss, _ = step(params, opt_state, batch)
            losses.append(float(loss))
        results[name] = (losses, params)

    np.testing.assert_allclose(results["plain"][0], results["remat"][0],
                               rtol=1e-5)
    jax.tree_util.tree_map(
        # adamw's rsqrt(second moment) amplifies the ~1e-7 gradient
        # reassociation over steps; the loss trajectory above is the tight
        # contract, parameters get the amplified band.
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5),
        results["plain"][1], results["remat"][1],
    )
