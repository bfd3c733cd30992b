"""Tensor-parallel INFERENCE: greedy decode with the realized TP plan
(colwise/rowwise NamedShardings, parallel/mesh.py) on a tp=2 virtual-CPU
mesh must be token-exact vs the unsharded decode — proving the TP plan for
serving, not just the SFT step (VERDICT round-1 item 9)."""

import numpy as np
import jax
import jax.numpy as jnp

from qwen_tts_tpu.config import tiny_tts_config
from qwen_tts_tpu.generate import (
    GenerationParams,
    batch_prompts,
    build_prompt,
    generate_codes,
)
from qwen_tts_tpu.models import subtalker as st_mod
from qwen_tts_tpu.models import talker as talker_mod
from qwen_tts_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params

CFG = tiny_tts_config()


def _gen(talker_params, st_params, embeds, mask, trailing, max_new=10):
    gp = GenerationParams(
        max_new_tokens=max_new, min_new_tokens=max_new,
        do_sample=False, subtalker_do_sample=False, repetition_penalty=1.0,
    )
    out = generate_codes(
        talker_params, st_params, CFG.talker,
        embeds, mask, trailing,
        sampling=gp.talker_sampling(), st_sampling=gp.subtalker_sampling(),
        max_new_tokens=max_new, rng=jax.random.PRNGKey(0),
    )
    return np.asarray(out.codes), np.asarray(out.num_gen)


def test_tp2_sharded_greedy_decode_matches_unsharded():
    rng = jax.random.PRNGKey(0)
    talker_params = talker_mod.init_talker_params(rng, CFG.talker)
    st_params = st_mod.init_subtalker_params(
        jax.random.fold_in(rng, 1), CFG.talker.code_predictor,
        CFG.talker.hidden_size,
    )
    ids_a = np.array([1, 2, 3, 10, 11, 12, 4, 5, 1, 2, 3], np.int32)
    ids_b = np.array([1, 2, 3, 20, 21, 22, 23, 4, 5, 1, 2, 3], np.int32)
    prompts = [
        build_prompt(talker_params, CFG, ids_a, language="english",
                     speaker="aiden"),
        build_prompt(talker_params, CFG, ids_b, language="auto",
                     speaker=None),
    ]
    embeds, mask, trailing, _ = batch_prompts(prompts)
    embeds = jnp.asarray(embeds)
    mask = jnp.asarray(mask)
    trailing = jnp.asarray(trailing)

    codes_ref, num_ref = _gen(talker_params, st_params, embeds, mask, trailing)

    mesh = make_mesh(2, tp=2)
    with mesh:
        tp_talker, tp_st = shard_params(mesh, talker_params, st_params)
        # Realized TP: weight shards live on different devices.
        assert len(tp_talker["trunk"]["wq"].sharding.device_set) == 2
        assert len(tp_st["lm_heads"].sharding.device_set) == 2
        e = jax.device_put(embeds, batch_sharding(mesh, 3))
        m = jax.device_put(mask, batch_sharding(mesh, 2))
        t = jax.device_put(trailing, batch_sharding(mesh, 3))
        codes_tp, num_tp = _gen(tp_talker, tp_st, e, m, t)

    np.testing.assert_array_equal(num_ref, num_tp)
    np.testing.assert_array_equal(codes_ref, codes_tp)


def test_dp2_tp2_sharded_greedy_decode_matches_unsharded():
    """Full serving-mesh shape — batch over dp, weights over tp (dp=2 x tp=2
    on the virtual 8-device CPU mesh) — must stay token-exact. This is the
    §2.5 DP row exercised as real multi-device data parallelism, not just
    a batched single-device run."""
    rng = jax.random.PRNGKey(7)
    talker_params = talker_mod.init_talker_params(rng, CFG.talker)
    st_params = st_mod.init_subtalker_params(
        jax.random.fold_in(rng, 1), CFG.talker.code_predictor,
        CFG.talker.hidden_size,
    )
    base = np.array([1, 2, 3, 10, 11, 12, 4, 5, 1, 2, 3], np.int32)
    prompts = [
        build_prompt(talker_params, CFG, base + i, language="english",
                     speaker="aiden")
        for i in range(4)
    ]
    embeds, mask, trailing, _ = batch_prompts(prompts)
    embeds, mask, trailing = map(jnp.asarray, (embeds, mask, trailing))

    codes_ref, num_ref = _gen(talker_params, st_params, embeds, mask, trailing)

    mesh = make_mesh(4, tp=2)
    assert dict(mesh.shape) == {"dp": 2, "tp": 2}
    with mesh:
        sh_talker, sh_st = shard_params(mesh, talker_params, st_params)
        e = jax.device_put(embeds, batch_sharding(mesh, 3))
        m = jax.device_put(mask, batch_sharding(mesh, 2))
        t = jax.device_put(trailing, batch_sharding(mesh, 3))
        # rows land on distinct dp shards
        assert len(e.sharding.device_set) == 4
        codes_dp, num_dp = _gen(sh_talker, sh_st, e, m, t)

    np.testing.assert_array_equal(num_ref, num_dp)
    np.testing.assert_array_equal(codes_ref, codes_dp)
