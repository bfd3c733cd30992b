"""Talker sliding-window attention option (VERDICT r3 item 5).

The reference plumbs ``use_sliding_window``/``sliding_window``/
``max_window_layers`` into the talker (configuration_qwen3_tts.py:205-224),
defaulted OFF and unused by shipped checkpoints: ``sliding_window`` is None
unless ``use_sliding_window``, and only layers ``i >= max_window_layers``
become sliding (``:248-255``). These tests pin

* config round-trip of the three fields (from_dict),
* window=None ≡ today's behavior bit-for-bit (enabled-but-vacuous configs
  included, e.g. max_window_layers >= num_hidden_layers — the reference
  default 28 > 20 means even an enabled flagship config is vacuous),
* a small window CHANGES both the prefill trace and the decode-step trace,
* the per-layer split: layers below max_window_layers stay full attention.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_tts_tpu.config import TalkerConfig, tiny_tts_config
from qwen_tts_tpu.models import talker as talker_mod


def _cfg(**kw) -> TalkerConfig:
    return dataclasses.replace(tiny_tts_config().talker, **kw)


def test_config_round_trip_and_defaults():
    base = TalkerConfig.from_dict({})
    assert base.use_sliding_window is False
    assert base.max_window_layers == 28
    assert base.layer_windows() is None  # off by default

    d = {"use_sliding_window": True, "sliding_window": 3,
         "max_window_layers": 1, "num_hidden_layers": 4}
    cfg = TalkerConfig.from_dict(d)
    assert cfg.use_sliding_window and cfg.sliding_window == 3
    lw = cfg.layer_windows()
    assert lw is not None and lw.shape == (4,)
    assert list(lw[1:]) == [3, 3, 3] and lw[0] >= 2 ** 29  # full-attn sentinel

    # Reference quirk: sliding_window may be serialized as null when off.
    off = TalkerConfig.from_dict({"use_sliding_window": True,
                                  "sliding_window": None})
    assert off.layer_windows() is None


def test_vacuous_enable_is_bit_identical():
    """use_sliding_window=True with max_window_layers >= L (the reference
    DEFAULT relationship for the 20-layer talker) must not change a bit."""
    cfg0 = _cfg()
    cfg1 = _cfg(use_sliding_window=True, sliding_window=2,
                max_window_layers=cfg0.num_hidden_layers)
    assert cfg1.layer_windows() is None

    rng = jax.random.PRNGKey(0)
    params = talker_mod.init_talker_params(rng, cfg0)
    b, s = 2, 10
    embeds = jax.random.normal(jax.random.fold_in(rng, 1),
                               (b, s, cfg0.hidden_size)) * 0.1
    mask = jnp.ones((b, s), bool)
    kc, vc = talker_mod.alloc_kv_cache(cfg0, b, s + 4)
    out0 = talker_mod.talker_prefill(params, cfg0, embeds, mask, kc, vc)
    out1 = talker_mod.talker_prefill(params, cfg1, embeds, mask, kc, vc)
    np.testing.assert_array_equal(np.asarray(out0.logits),
                                  np.asarray(out1.logits))


@pytest.mark.parametrize("max_window_layers", [0, 1])
def test_small_window_changes_trace(max_window_layers):
    cfg0 = _cfg()
    cfg1 = _cfg(use_sliding_window=True, sliding_window=2,
                max_window_layers=max_window_layers)
    rng = jax.random.PRNGKey(1)
    params = talker_mod.init_talker_params(rng, cfg0)
    b, s = 2, 12
    embeds = jax.random.normal(jax.random.fold_in(rng, 1),
                               (b, s, cfg0.hidden_size)) * 0.1
    mask = jnp.ones((b, s), bool)
    kc, vc = talker_mod.alloc_kv_cache(cfg0, b, s + 4)
    out0 = talker_mod.talker_prefill(params, cfg0, embeds, mask, kc, vc)
    out1 = talker_mod.talker_prefill(params, cfg1, embeds, mask, kc, vc)
    assert not np.allclose(np.asarray(out0.logits), np.asarray(out1.logits))

    # Decode step: position s+1 attending over the prefilled cache must see
    # only the trailing window in sliding layers.
    emb = jax.random.normal(jax.random.fold_in(rng, 2),
                            (b, cfg0.hidden_size)) * 0.1
    pos = jnp.full((b,), s, jnp.int32)
    d0 = talker_mod.talker_decode_step(
        params, cfg0, emb, pos, out0.k_cache, out0.v_cache,
        jnp.int32(s + 1), jnp.zeros((b,), jnp.int32))
    d1 = talker_mod.talker_decode_step(
        params, cfg1, emb, pos, out0.k_cache, out0.v_cache,
        jnp.int32(s + 1), jnp.zeros((b,), jnp.int32))
    assert not np.allclose(np.asarray(d0[0]), np.asarray(d1[0]))


def test_window_equals_seqlen_is_identity():
    """A window covering the whole sequence in every layer equals full
    attention exactly (the sentinel encoding and the mask algebra agree)."""
    cfg0 = _cfg()
    b, s = 1, 8
    cfg1 = _cfg(use_sliding_window=True, sliding_window=s + 4,
                max_window_layers=0)
    rng = jax.random.PRNGKey(2)
    params = talker_mod.init_talker_params(rng, cfg0)
    embeds = jax.random.normal(jax.random.fold_in(rng, 1),
                               (b, s, cfg0.hidden_size)) * 0.1
    mask = jnp.ones((b, s), bool)
    kc, vc = talker_mod.alloc_kv_cache(cfg0, b, s + 2)
    out0 = talker_mod.talker_prefill(params, cfg0, embeds, mask, kc, vc)
    out1 = talker_mod.talker_prefill(params, cfg1, embeds, mask, kc, vc)
    np.testing.assert_allclose(np.asarray(out0.logits),
                               np.asarray(out1.logits), rtol=0, atol=0)
