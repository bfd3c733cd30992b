"""EMA VQ training parity vs the actual reference core_vq package.

The reference's training-era VQ (qwen_tts/core/tokenizer_25hz/vq/core_vq.py)
is imported directly and run in-the-loop as the oracle: same initial
codebooks + projections, same inputs, multiple EMA steps — indices must match
exactly and all four EMA buffers must track to float tolerance.

The "Distributed" in the reference's class names is aspirational — its
distrib.broadcast_tensors calls are commented out (core_vq.py:161-162,
185-186,437-438). The JAX implementation's data-parallel path is real
(psum'd sufficient statistics inside shard_map) and is pinned here against
the single-device full-batch step.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from qwen_tts_tpu.training.vq import (
    VQState,
    VQTrainConfig,
    init_vq_params,
    init_vq_state,
    make_sharded_vq_train_step,
    vq_decode,
    vq_encode,
    vq_train_step,
)


def _ref_core_vq():
    from ref_oracle import install_ref_stubs

    install_ref_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from qwen_tts.core.tokenizer_25hz.vq import core_vq

    return core_vq


CFG = VQTrainConfig(
    dim=16,
    codebook_size=24,
    codebook_dim=8,
    num_quantizers=3,
    num_groups=1,
    decay=0.9,
    epsilon=1e-5,
    kmeans_init=False,
    threshold_ema_dead_code=0.0,   # expiry draws RNG — tested separately
    commitment_weight=1.0,
)


def _make_ref_rvq(core_vq, cfg: VQTrainConfig, seed: int):
    torch.manual_seed(seed)
    return core_vq.DistributedResidualVectorQuantization(
        num_quantizers=cfg.num_quantizers,
        quantize_dropout=False,
        rand_num_quant=None,
        dim=cfg.dim // cfg.num_groups,
        codebook_size=cfg.codebook_size,
        codebook_dim=cfg.codebook_dim,
        decay=cfg.decay,
        epsilon=cfg.epsilon,
        kmeans_init=False,
        kmeans_iters=5,
        threshold_ema_dead_code=cfg.threshold_ema_dead_code,
        commitment_weight=cfg.commitment_weight,
    )


def _state_params_from_ref(rvqs, cfg: VQTrainConfig):
    """Copy one-or-more reference RVQ modules (one per group) into the
    stacked [G, Q, ...] JAX state/params."""
    st = VQState(
        inited=jnp.stack(
            [jnp.asarray(m.inited.numpy()[:, 0] != 0) for m in rvqs]
        ),
        cluster_size=jnp.stack(
            [jnp.asarray(m.cluster_size.numpy()) for m in rvqs]
        ),
        embed=jnp.stack([jnp.asarray(m.embed.numpy()) for m in rvqs]),
        embed_avg=jnp.stack([jnp.asarray(m.embed_avg.numpy()) for m in rvqs]),
    )
    if not cfg.has_projection:  # reference uses nn.Identity (core_vq:279-281)
        return st, None
    params = {
        "in_w": jnp.stack(
            [
                jnp.stack(
                    [
                        jnp.asarray(l.project_in.weight.detach().numpy().T)
                        for l in m.layers
                    ]
                )
                for m in rvqs
            ]
        ),
        "in_b": jnp.stack(
            [
                jnp.stack(
                    [
                        jnp.asarray(l.project_in.bias.detach().numpy())
                        for l in m.layers
                    ]
                )
                for m in rvqs
            ]
        ),
        "out_w": jnp.stack(
            [
                jnp.stack(
                    [
                        jnp.asarray(l.project_out.weight.detach().numpy().T)
                        for l in m.layers
                    ]
                )
                for m in rvqs
            ]
        ),
        "out_b": jnp.stack(
            [
                jnp.stack(
                    [
                        jnp.asarray(l.project_out.bias.detach().numpy())
                        for l in m.layers
                    ]
                )
                for m in rvqs
            ]
        ),
    }
    return st, params


def test_rvq_train_parity_vs_reference():
    core_vq = _ref_core_vq()
    ref = _make_ref_rvq(core_vq, CFG, seed=0)
    state, params = _state_params_from_ref([ref], CFG)

    rng = np.random.default_rng(42)
    step = jax.jit(
        lambda s, p, x, r: vq_train_step(s, p, x, r, cfg=CFG)
    )
    for i in range(4):
        x = rng.standard_normal((2, 9, CFG.dim)).astype(np.float32)
        with torch.no_grad():
            q_ref, idx_ref, loss_ref = ref(torch.from_numpy(x))
        state, out = step(state, params, jnp.asarray(x), jax.random.PRNGKey(i))

        np.testing.assert_array_equal(
            np.asarray(out.indices)[0], idx_ref.numpy(), err_msg=f"step {i}"
        )
        np.testing.assert_allclose(
            np.asarray(out.quantized), q_ref.numpy(), atol=2e-5,
            err_msg=f"step {i}",
        )
        np.testing.assert_allclose(
            np.asarray(out.loss), loss_ref.numpy()[:, 0], atol=2e-5,
            err_msg=f"step {i}",
        )

    np.testing.assert_allclose(
        np.asarray(state.cluster_size)[0], ref.cluster_size.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state.embed_avg)[0], ref.embed_avg.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state.embed)[0], ref.embed.numpy(), atol=1e-5
    )


def test_group_rvq_parity_vs_reference_pair():
    """G=2 group split vs two independent reference RVQs fed the two feature
    halves (the feature split of arXiv:2305.02765; upstream's chunk(dim=1)
    splits TIME under its channels-last call layout — see module docstring)."""
    core_vq = _ref_core_vq()
    cfg = VQTrainConfig(
        dim=16, codebook_size=24, codebook_dim=8, num_quantizers=2,
        num_groups=2, decay=0.9, kmeans_init=False,
        threshold_ema_dead_code=0.0,
    )
    refs = [_make_ref_rvq(core_vq, cfg, seed=s) for s in (1, 2)]
    state, params = _state_params_from_ref(refs, cfg)

    rng = np.random.default_rng(7)
    x = rng.standard_normal((3, 5, cfg.dim)).astype(np.float32)
    with torch.no_grad():
        q0, idx0, _ = refs[0](torch.from_numpy(x[..., :8]))
        q1, idx1, _ = refs[1](torch.from_numpy(x[..., 8:]))

    state, out = vq_train_step(
        state, params, jnp.asarray(x), jax.random.PRNGKey(0), cfg=cfg
    )
    np.testing.assert_array_equal(np.asarray(out.indices)[0], idx0.numpy())
    np.testing.assert_array_equal(np.asarray(out.indices)[1], idx1.numpy())
    ref_q = np.concatenate([q0.numpy(), q1.numpy()], axis=-1)
    np.testing.assert_allclose(np.asarray(out.quantized), ref_q, atol=2e-5)
    for g, ref in enumerate(refs):
        np.testing.assert_allclose(
            np.asarray(state.embed)[g], ref.embed.numpy(), atol=1e-5
        )


def test_encode_decode_parity_vs_reference():
    core_vq = _ref_core_vq()
    ref = _make_ref_rvq(core_vq, CFG, seed=3)
    state, params = _state_params_from_ref([ref], CFG)

    x = np.random.default_rng(9).standard_normal((2, 7, CFG.dim)).astype(
        np.float32
    )
    with torch.no_grad():
        idx_ref = ref.encode(torch.from_numpy(x))
        dec_ref = ref.decode(idx_ref)

    idx = vq_encode(state, params, jnp.asarray(x), cfg=CFG)
    np.testing.assert_array_equal(np.asarray(idx)[0], idx_ref.numpy())
    dec = vq_decode(state, params, idx, cfg=CFG)
    np.testing.assert_allclose(np.asarray(dec), dec_ref.numpy(), atol=2e-5)


def test_dp_sharded_step_matches_full_batch():
    """The real distributed path: batch sharded dp=4 via shard_map; psum'd
    EMA stats + all-gathered kmeans init must equal the unsharded step."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg = VQTrainConfig(
        dim=8, codebook_size=16, codebook_dim=None, num_quantizers=2,
        num_groups=1, decay=0.9, kmeans_init=True, kmeans_iters=4,
        threshold_ema_dead_code=0.0,
    )
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.array(devs[:4]), ("dp",))

    state = init_vq_state(cfg)
    x = np.random.default_rng(0).standard_normal((8, 6, cfg.dim)).astype(
        np.float32
    )
    rng = jax.random.PRNGKey(5)

    ref_state, ref_out = vq_train_step(
        state, None, jnp.asarray(x), rng, cfg=cfg
    )

    step = make_sharded_vq_train_step(mesh, cfg)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("dp")))
    sh_state, sh_out = step(state, None, xs, rng)

    np.testing.assert_array_equal(
        np.asarray(sh_out.indices), np.asarray(ref_out.indices)
    )
    for name in ("cluster_size", "embed", "embed_avg"):
        np.testing.assert_allclose(
            np.asarray(getattr(sh_state, name)),
            np.asarray(getattr(ref_state, name)),
            atol=1e-5,
            err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(sh_out.loss), np.asarray(ref_out.loss), atol=1e-5
    )

    # second step from the (identical) updated state stays in lockstep
    x2 = np.random.default_rng(1).standard_normal((8, 6, cfg.dim)).astype(
        np.float32
    )
    rng2 = jax.random.PRNGKey(6)
    ref_state2, ref_out2 = vq_train_step(
        ref_state, None, jnp.asarray(x2), rng2, cfg=cfg
    )
    sh_state2, sh_out2 = step(
        sh_state, None,
        jax.device_put(jnp.asarray(x2), NamedSharding(mesh, P("dp"))), rng2,
    )
    np.testing.assert_array_equal(
        np.asarray(sh_out2.indices), np.asarray(ref_out2.indices)
    )
    np.testing.assert_allclose(
        np.asarray(sh_state2.embed), np.asarray(ref_state2.embed), atol=1e-5
    )


def test_dead_code_expiry_replaces_embeddings():
    cfg = VQTrainConfig(
        dim=4, codebook_size=8, num_quantizers=1, num_groups=1,
        decay=0.9, kmeans_init=False, threshold_ema_dead_code=2.0,
    )
    state = init_vq_state(cfg, jax.random.PRNGKey(0))
    # code 0 is dead: tiny EMA usage AND far from the data cloud so no
    # points can re-assign to it
    cs = np.full((1, 1, cfg.codebook_size), 10.0, np.float32)
    cs[0, 0, 0] = 1e-4
    emb = np.asarray(state.embed).copy()
    emb[0, 0, 0] = 100.0
    state = state._replace(
        cluster_size=jnp.asarray(cs),
        embed=jnp.asarray(emb),
        embed_avg=jnp.asarray(emb.copy()),
    )
    dead_row = emb[0, 0, 0].copy()

    x = np.random.default_rng(2).standard_normal((4, 6, cfg.dim)).astype(
        np.float32
    )
    new_state, out = vq_train_step(
        state, None, jnp.asarray(x), jax.random.PRNGKey(1), cfg=cfg
    )
    # Expiry runs BEFORE quantize (reference order, core_vq.py:227-230): the
    # dead row is replaced by a batch row, so this batch already assigns
    # points to code 0. (The stored embed can still be transiently large —
    # the reference's replace_ writes only `embed` while `embed_avg` stays
    # stale until EMA re-converges; we replicate that.)
    assert (np.asarray(out.indices)[0, 0] == 0).any(), (
        "expired code was not replaced with a usable batch row"
    )
    moved = np.linalg.norm(np.asarray(new_state.embed)[0, 0, 0] - dead_row)
    assert moved > 1.0, "dead code row did not move"

    # Without expiry nothing ever assigns to the far-away row, and the
    # laplace-normalized EMA divides its stale embed_avg by ~zero usage —
    # the row blows up (the failure mode threshold_ema_dead_code prevents).
    cfg0 = VQTrainConfig(
        dim=4, codebook_size=8, num_quantizers=1, num_groups=1,
        decay=0.9, kmeans_init=False, threshold_ema_dead_code=0.0,
    )
    kept, out0 = vq_train_step(
        state, None, jnp.asarray(x), jax.random.PRNGKey(1), cfg=cfg0
    )
    assert not (np.asarray(out0.indices)[0, 0] == 0).any()
    assert np.linalg.norm(np.asarray(kept.embed)[0, 0, 0]) > 50.0


def test_quantize_dropout_masks_tail_quantizers():
    cfg = VQTrainConfig(
        dim=4, codebook_size=8, num_quantizers=3, num_groups=1,
        decay=0.9, kmeans_init=False, threshold_ema_dead_code=0.0,
        quantize_dropout=True, rand_num_quant=(1, 2),
    )
    state = init_vq_state(cfg, jax.random.PRNGKey(0))
    x = np.random.default_rng(3).standard_normal((2, 5, cfg.dim)).astype(
        np.float32
    )

    seen = set()
    for seed in range(8):
        new_state, out = vq_train_step(
            state, None, jnp.asarray(x), jax.random.PRNGKey(seed), cfg=cfg
        )
        idx = np.asarray(out.indices)[0]         # [Q, B, T]
        active = [int((idx[q] >= 0).all()) for q in range(3)]
        n_active = sum(active)
        seen.add(n_active)
        assert n_active in (1, 2)
        for q in range(3):
            if q >= n_active:
                assert (idx[q] == -1).all()
                # dropped quantizers' buffers do not move
                np.testing.assert_array_equal(
                    np.asarray(new_state.embed)[0, q],
                    np.asarray(state.embed)[0, q],
                )
                assert float(np.asarray(out.loss)[q]) == 0.0
            else:
                assert (idx[q] >= 0).all()
    assert seen == {1, 2}, "both dropout draws should occur across seeds"


def test_q0_ds_ratio_mechanics():
    """Quantizer 0 runs at half time rate and its output is nearest-
    upsampled back (core_vq.py:417-428): its index track repeats in pairs."""
    cfg = VQTrainConfig(
        dim=4, codebook_size=8, num_quantizers=2, num_groups=1,
        decay=0.9, kmeans_init=False, threshold_ema_dead_code=0.0,
        q0_ds_ratio=2,
    )
    state = init_vq_state(cfg, jax.random.PRNGKey(0))
    x = np.random.default_rng(4).standard_normal((2, 8, cfg.dim)).astype(
        np.float32
    )
    _, out = vq_train_step(
        state, None, jnp.asarray(x), jax.random.PRNGKey(1), cfg=cfg
    )
    idx = np.asarray(out.indices)[0]             # [Q, B, T]
    np.testing.assert_array_equal(idx[0, :, 0::2], idx[0, :, 1::2])
    assert out.quantized.shape == (2, 8, cfg.dim)
