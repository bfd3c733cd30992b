"""EMA vector-quantizer training — the 25Hz tokenizer's VQ learning stage.

TPU-native re-design of the reference's training-era VQ package
(qwen_tts/core/tokenizer_25hz/vq/core_vq.py — EuclideanCodebook :109-246,
VectorQuantization :249-338, DistributedResidualVectorQuantization :330-462,
DistributedGroupResidualVectorQuantization :465-522):

- State is a pure pytree of stacked ``[G, Q, ...]`` codebook buffers; one
  train step is a jittable pure function ``(state, x, rng) -> (state', out)``.
- The residual loop over quantizers is a ``lax.scan``; the group split of
  GRVQ is a ``vmap`` over stacked group state.
- Data-parallel EMA is REAL here: the per-batch sufficient statistics
  (one-hot counts and per-code embedding sums) are ``lax.psum``'d over a
  mesh axis before the EMA update, so a dp-sharded step produces exactly the
  same codebooks as a single-device step on the concatenated batch. The
  reference only gestures at this — its ``distrib.broadcast_tensors`` sync
  calls are commented out (core_vq.py:161-162,185-186,437-438), so its
  "Distributed" classes never actually synchronize workers.

Upstream quirks deliberately not replicated (documented divergences):

- Layout: the only call site (speech_vq.py:_do_quantize :239-262) feeds
  channels-last ``[B, T, D]`` through ``.encode``/``.decode``, while
  ``forward`` reads shapes as ``[B, C, T]`` (core_vq.py:394) and sizes its
  quantize-dropout null tensors accordingly (:404-406). We standardize on
  channels-last ``[B, T, D]`` everywhere (the TPU lane dim is the feature
  dim).
- The GRVQ group split upstream is ``torch.chunk(x, dim=1)`` — the TIME
  axis under the call site's layout. Per the GRVQ construction it follows
  (arXiv:2305.02765, "Group Then rvq") the split is over FEATURES; we split
  the feature dim. Upstream never exercises it (``num_groups=1``,
  speech_vq.py:219).
- The training forward is unreachable upstream: the one call site raises
  ``NotImplementedError`` when ``self.training`` (speech_vq.py:256).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass(frozen=True)
class VQTrainConfig:
    """Mirrors the knobs of core_vq.py's constructors (:129-146, :262-276,
    :336-347, :470-478)."""

    dim: int                      # input feature width (per group: dim//G)
    codebook_size: int
    codebook_dim: Optional[int] = None   # None → dim//num_groups (no proj)
    num_quantizers: int = 1
    num_groups: int = 1
    decay: float = 0.99
    epsilon: float = 1e-5
    kmeans_init: bool = True
    kmeans_iters: int = 50
    threshold_ema_dead_code: float = 2.0
    commitment_weight: float = 1.0
    quantize_dropout: bool = False
    rand_num_quant: Optional[Tuple[int, ...]] = None
    q0_ds_ratio: int = 1          # quantizer-0 time downsample (core_vq:419)

    def __post_init__(self):
        if self.dim % self.num_groups:
            raise ValueError("dim must divide evenly into num_groups")

    @property
    def group_dim(self) -> int:
        return self.dim // self.num_groups

    @property
    def cb_dim(self) -> int:
        return self.codebook_dim if self.codebook_dim is not None else self.group_dim

    @property
    def has_projection(self) -> bool:
        return self.cb_dim != self.group_dim


class VQState(NamedTuple):
    """EMA codebook buffers, stacked ``[G, Q, ...]`` (the reference registers
    the same four buffers stacked ``[Q, ...]`` per RVQ, core_vq.py:370-373)."""

    inited: jnp.ndarray        # [G, Q] bool
    cluster_size: jnp.ndarray  # [G, Q, N] f32
    embed: jnp.ndarray         # [G, Q, N, Dc] f32
    embed_avg: jnp.ndarray     # [G, Q, N, Dc] f32


class VQOutput(NamedTuple):
    quantized: jnp.ndarray     # [B, T, dim] — ST-passthrough in training
    indices: jnp.ndarray       # [G, Q, B, T] int32; -1 where dropped out
    loss: jnp.ndarray          # [Q] commitment loss (mean over groups)


# --------------------------------------------------------------------------
# init


def _kaiming_uniform(rng: jax.Array, shape, fan_in: int) -> jnp.ndarray:
    # torch.nn.init.kaiming_uniform_ defaults (core_vq.py uniform_init :59-62)
    bound = (6.0 / fan_in) ** 0.5
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)


def init_vq_state(cfg: VQTrainConfig, rng: Optional[jax.Array] = None) -> VQState:
    g, q, n, d = cfg.num_groups, cfg.num_quantizers, cfg.codebook_size, cfg.cb_dim
    if cfg.kmeans_init:
        embed = jnp.zeros((g, q, n, d), jnp.float32)
        inited = jnp.zeros((g, q), bool)
    else:
        if rng is None:
            raise ValueError("uniform init needs an rng")
        embed = _kaiming_uniform(rng, (g, q, n, d), fan_in=d)
        inited = jnp.ones((g, q), bool)
    return VQState(
        inited=inited,
        cluster_size=jnp.zeros((g, q, n), jnp.float32),
        embed=embed,
        embed_avg=embed.copy(),
    )


def init_vq_params(cfg: VQTrainConfig, rng: jax.Array) -> Optional[dict]:
    """Per-quantizer project_in/out Linear params (core_vq.py:279-281), or
    None when codebook_dim == the per-group feature dim (Identity)."""
    if not cfg.has_projection:
        return None
    g, q, dg, dc = cfg.num_groups, cfg.num_quantizers, cfg.group_dim, cfg.cb_dim
    k_iw, k_ib, k_ow, k_ob = jax.random.split(rng, 4)
    # torch Linear default init: kaiming_uniform(a=sqrt(5)) → U(±1/sqrt(fan))
    lim_in, lim_out = dg ** -0.5, dc ** -0.5
    return {
        "in_w": jax.random.uniform(k_iw, (g, q, dg, dc), jnp.float32, -lim_in, lim_in),
        "in_b": jax.random.uniform(k_ib, (g, q, dc), jnp.float32, -lim_in, lim_in),
        "out_w": jax.random.uniform(k_ow, (g, q, dc, dg), jnp.float32, -lim_out, lim_out),
        "out_b": jax.random.uniform(k_ob, (g, q, dg), jnp.float32, -lim_out, lim_out),
    }


# --------------------------------------------------------------------------
# primitives


def _sample_vectors(rng: jax.Array, samples: jnp.ndarray, num: int) -> jnp.ndarray:
    """Random rows from [M, D] (core_vq.py sample_vectors :65-73): a
    permutation prefix when the batch is big enough, else with replacement."""
    m = samples.shape[0]
    if m >= num:
        idx = jax.random.permutation(rng, m)[:num]
    else:
        idx = jax.random.randint(rng, (num,), 0, m)
    return samples[idx]


def _nearest_code(x: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """argmax of the negated squared euclidean distance, exactly as the
    reference forms it (core_vq.py quantize :187-195) so tie-breaking
    (first max) matches."""
    dist = -(
        jnp.sum(x * x, axis=-1, keepdims=True)
        - 2.0 * x @ embed.T
        + jnp.sum(embed * embed, axis=-1)[None, :]
    )
    return jnp.argmax(dist, axis=-1).astype(jnp.int32)


def kmeans(
    rng: jax.Array, samples: jnp.ndarray, num_clusters: int, num_iters: int = 10
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K-means over [M, D] rows (core_vq.py kmeans :76-103): random-row init,
    hard assignment, empty clusters keep their previous mean. Returns
    (means [N, D], bins [N])."""
    means0 = _sample_vectors(rng, samples, num_clusters)

    def body(_, means):
        buckets = _nearest_code(samples, means)
        bins = jnp.zeros((num_clusters,), jnp.float32).at[buckets].add(1.0)
        sums = (
            jnp.zeros((num_clusters, samples.shape[-1]), samples.dtype)
            .at[buckets]
            .add(samples)
        )
        new_means = sums / jnp.maximum(bins, 1.0)[:, None]
        return jnp.where((bins == 0)[:, None], means, new_means)

    means = lax.fori_loop(0, num_iters, body, means0)
    buckets = _nearest_code(samples, means)
    bins = jnp.zeros((num_clusters,), jnp.float32).at[buckets].add(1.0)
    return means, bins


def _psum(x, axis_name):
    return lax.psum(x, axis_name) if axis_name else x


# --------------------------------------------------------------------------
# one quantizer layer, one train step


def _layer_train(
    carry_x: jnp.ndarray,          # [M, Dg] residual (flattened batch)
    layer_state: tuple,            # (inited, cluster_size, embed, embed_avg)
    layer_params: Optional[dict],  # per-quantizer projections or None
    rng: jax.Array,
    active: jnp.ndarray,           # scalar bool — quantize-dropout mask
    cfg: VQTrainConfig,
    axis_name: Optional[str],
):
    """One VectorQuantization forward+EMA update (core_vq.py:221-246,307-338)
    on pre-flattened rows. Returns (new_state, quantized [M, Dg],
    indices [M], commit_loss scalar)."""
    inited, cluster_size, embed, embed_avg = layer_state
    x_in = carry_x
    if layer_params is not None:
        x = x_in @ layer_params["in_w"] + layer_params["in_b"]
    else:
        x = x_in

    k_init, k_expire = jax.random.split(rng)

    # kmeans init on the first batch (core_vq.py init_embed_ :152-162).
    # Under dp the local shard alone seeds the codebook identically on every
    # shard only if the data is identical; we instead run kmeans on the
    # all-gathered rows so initialization matches the full-batch run.
    if cfg.kmeans_init:
        x_init = (
            lax.all_gather(x, axis_name).reshape(-1, x.shape[-1])
            if axis_name
            else x
        )

        def do_init(_):
            m, b = kmeans(k_init, x_init, cfg.codebook_size, cfg.kmeans_iters)
            return m, m, b

        def no_init(_):
            return embed, embed_avg, cluster_size

        embed, embed_avg, cluster_size = lax.cond(inited, no_init, do_init, None)
        inited = jnp.ones((), bool)

    # dead-code expiry BEFORE quantizing, on the synced stats
    # (core_vq.py expire_codes_ :170-186, called at :227-230). Decision bits
    # are identical across shards (stats are psum'd); the replacement rows
    # are drawn from shard 0's batch so all shards write the same codebook.
    if cfg.threshold_ema_dead_code > 0:
        frac = (
            cluster_size
            / jnp.maximum(jnp.sum(cluster_size), 1e-12)
            * cfg.codebook_size
        )
        expired = frac < cfg.threshold_ema_dead_code
        repl = _sample_vectors(k_expire, x, cfg.codebook_size)
        if axis_name:
            repl = lax.all_gather(repl, axis_name)[0]
        # Upstream, all-zero EMA stats give 0/0 = NaN fractions whose
        # `< threshold` compares False — i.e. a never-updated codebook is
        # never expired (core_vq.py:174-175). The sum>0 guard reproduces
        # that explicitly instead of via NaN semantics. A codebook kmeans-
        # initialized THIS step has cluster_size = kmeans bins (sum>0) and
        # is eligible, matching the reference call order (:227-230).
        do_expire = active & (jnp.sum(cluster_size) > 0)
        new_embed = jnp.where(expired[:, None], repl, embed)
        embed = jnp.where(do_expire, new_embed, embed)

    idx = _nearest_code(x, embed)                      # [M]
    quant = embed[idx]                                 # [M, Dc]

    # EMA statistics, psum'd over the data axis → every shard applies the
    # global update (the TPU-native version of the broadcast the reference
    # comments out).
    counts = jnp.zeros((cfg.codebook_size,), jnp.float32).at[idx].add(1.0)
    embed_sum = (
        jnp.zeros((cfg.codebook_size, x.shape[-1]), jnp.float32)
        .at[idx]
        .add(lax.stop_gradient(x))
    )
    counts = _psum(counts, axis_name)
    embed_sum = _psum(embed_sum, axis_name)

    d = cfg.decay
    new_cluster = cluster_size * d + counts * (1.0 - d)
    new_avg = embed_avg * d + embed_sum * (1.0 - d)
    smoothed = (
        (new_cluster + cfg.epsilon)
        / (jnp.sum(new_cluster) + cfg.codebook_size * cfg.epsilon)
        * jnp.sum(new_cluster)
    )
    normalized = new_avg / smoothed[:, None]

    # straight-through estimator + commitment loss (core_vq.py:316-330)
    quant_st = x + lax.stop_gradient(quant - x)
    commit = jnp.mean((lax.stop_gradient(quant) - x) ** 2)
    commit = lax.pmean(commit, axis_name) if axis_name else commit

    if layer_params is not None:
        out = quant_st @ layer_params["out_w"] + layer_params["out_b"]
    else:
        out = quant_st

    # quantize-dropout: a dropped quantizer contributes nothing and its
    # buffers do not move (core_vq.py:409-415)
    sel = lambda a, b: jnp.where(active, a, b)  # noqa: E731
    new_state = (
        sel(inited, layer_state[0]),
        sel(new_cluster, layer_state[1]),
        sel(normalized, layer_state[2]),
        sel(new_avg, layer_state[3]),
    )
    out = jnp.where(active, out, jnp.zeros_like(out))
    idx = jnp.where(active, idx, jnp.full_like(idx, -1))
    commit = jnp.where(active, commit * cfg.commitment_weight, 0.0)
    return new_state, out, idx, commit


def _layer_encode(x_in, embed, layer_params):
    if layer_params is not None:
        x = x_in @ layer_params["in_w"] + layer_params["in_b"]
    else:
        x = x_in
    return _nearest_code(x, embed)


def _layer_decode(idx, embed, layer_params):
    q = embed[jnp.maximum(idx, 0)]
    if layer_params is not None:
        q = q @ layer_params["out_w"] + layer_params["out_b"]
    return q


def _interp_nearest(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') over the time axis (axis 0 of a
    flattened [T, ...] tensor): src = floor(i * in/out)."""
    t_in = x.shape[0]
    src = jnp.floor(jnp.arange(out_len) * (t_in / out_len)).astype(jnp.int32)
    return x[jnp.clip(src, 0, t_in - 1)]


# --------------------------------------------------------------------------
# residual VQ over one group


def _rvq_train_group(
    state_g: tuple,                 # tuple of [Q, ...] buffers for one group
    params_g: Optional[dict],       # {in_w: [Q,Dg,Dc], ...} or None
    x: jnp.ndarray,                 # [B, T, Dg]
    rngs: jnp.ndarray,              # [Q, 2] rng keys
    n_active: jnp.ndarray,          # scalar int — quantizers < n_active run
    cfg: VQTrainConfig,
    axis_name: Optional[str],
):
    b, t, dg = x.shape
    flat = x.reshape(b * t, dg)

    def step(carry, per_q):
        residual, quant_sum = carry
        q_idx, st, pr, rng = per_q
        active = q_idx < n_active
        new_st, out, idx, commit = _layer_train(
            residual, st, pr, rng, active, cfg, axis_name
        )
        return (residual - out, quant_sum + out), (new_st, idx, commit)

    qs = jnp.arange(cfg.num_quantizers)
    start = 0
    carry = (flat, jnp.zeros_like(flat))
    collected = []

    if cfg.q0_ds_ratio > 1:
        # quantizer 0 runs on a time-downsampled residual and its output is
        # upsampled back (core_vq.py:417-428); handled outside the scan
        # because its row count differs.
        res3 = carry[0].reshape(b, t, dg)
        t_ds = t // cfg.q0_ds_ratio
        x_ds = jax.vmap(lambda r: _interp_nearest(r, t_ds))(res3)
        st0 = tuple(s[0] for s in state_g)
        pr0 = (
            {k: v[0] for k, v in params_g.items()} if params_g is not None else None
        )
        new_st0, out0, idx0, commit0 = _layer_train(
            x_ds.reshape(b * t_ds, dg), st0, pr0, rngs[0],
            jnp.asarray(True), cfg, axis_name,
        )
        out0 = jax.vmap(lambda r: _interp_nearest(r, t))(
            out0.reshape(b, t_ds, dg)
        ).reshape(b * t, dg)
        idx0 = jax.vmap(lambda r: _interp_nearest(r, t))(
            idx0.reshape(b, t_ds)
        ).reshape(b * t)
        carry = (carry[0] - out0, carry[1] + out0)
        collected.append((new_st0, idx0, commit0))
        start = 1

    rest = slice(start, cfg.num_quantizers)
    st_rest = tuple(s[rest] for s in state_g)
    pr_rest = (
        {k: v[rest] for k, v in params_g.items()} if params_g is not None else None
    )
    carry, (new_st_rest, idxs, commits) = lax.scan(
        step, carry, (qs[rest], st_rest, pr_rest, rngs[rest])
    )

    if start == 1:
        new_st0, idx0, commit0 = collected[0]
        new_state = tuple(
            jnp.concatenate([s0[None], sr], axis=0)
            for s0, sr in zip(new_st0, new_st_rest)
        )
        idxs = jnp.concatenate([idx0[None], idxs], axis=0)
        commits = jnp.concatenate([commit0[None], commits], axis=0)
    else:
        new_state = new_st_rest

    _, quant_sum = carry
    return new_state, quant_sum.reshape(b, t, dg), idxs.reshape(-1, b, t), commits


# --------------------------------------------------------------------------
# public API


def vq_train_step(
    state: VQState,
    params: Optional[dict],
    x: jnp.ndarray,                 # [B, T, dim]
    rng: jax.Array,
    *,
    cfg: VQTrainConfig,
    n_q: Optional[int] = None,
    axis_name: Optional[str] = None,
) -> Tuple[VQState, VQOutput]:
    """One training forward + EMA codebook update over all groups/quantizers
    (DistributedGroupResidualVectorQuantization.forward, core_vq.py:503-517 /
    :388-441). Pass ``axis_name`` when called inside ``shard_map`` with the
    batch sharded over that mesh axis — the EMA update then matches the
    full-batch single-device step exactly."""
    g = cfg.num_groups
    b, t, _ = x.shape
    xg = x.reshape(b, t, g, cfg.group_dim).transpose(2, 0, 1, 3)  # [G,B,T,Dg]

    n_limit = n_q if n_q is not None else cfg.num_quantizers
    k_drop, k_layers = jax.random.split(rng)
    if cfg.quantize_dropout and cfg.rand_num_quant:
        # random cap on the number of active quantizers this step, shared by
        # every group (core_vq.py:399-415); synced across dp shards.
        choices = jnp.asarray(cfg.rand_num_quant, jnp.int32)
        pick = jax.random.randint(k_drop, (), 0, len(cfg.rand_num_quant))
        if axis_name:
            pick = lax.all_gather(pick, axis_name)[0]
        n_active = jnp.minimum(choices[pick], n_limit)
    else:
        n_active = jnp.asarray(n_limit, jnp.int32)

    rngs = jax.random.split(k_layers, g * cfg.num_quantizers).reshape(
        g, cfg.num_quantizers, 2
    )

    def per_group(state_g, params_g, xg_one, rngs_g):
        return _rvq_train_group(
            state_g, params_g, xg_one, rngs_g, n_active, cfg, axis_name
        )

    new_state_t, quant_g, idx_g, commits_g = jax.vmap(
        per_group, in_axes=(0, 0, 0, 0)
    )(tuple(state), params, xg, rngs)

    quant = quant_g.transpose(1, 2, 0, 3).reshape(b, t, cfg.dim)
    loss = jnp.mean(commits_g, axis=0)  # [Q] — mean over groups (:517)
    return VQState(*new_state_t), VQOutput(quant, idx_g, loss)


def vq_encode(
    state: VQState,
    params: Optional[dict],
    x: jnp.ndarray,
    *,
    cfg: VQTrainConfig,
    n_q: Optional[int] = None,
) -> jnp.ndarray:
    """Residual encode, no state change (core_vq.py:443-452 per group).
    Returns [G, Q, B, T] int32."""
    g = cfg.num_groups
    b, t, _ = x.shape
    n = n_q if n_q is not None else cfg.num_quantizers
    xg = x.reshape(b, t, g, cfg.group_dim).transpose(2, 0, 1, 3)

    def per_group(state_g, params_g, xone):
        flat = xone.reshape(b * t, cfg.group_dim)
        out = []
        residual = flat
        for i in range(n):
            pr = (
                {k: v[i] for k, v in params_g.items()}
                if params_g is not None
                else None
            )
            idx = _layer_encode(residual, state_g[2][i], pr)
            residual = residual - _layer_decode(idx, state_g[2][i], pr)
            out.append(idx)
        return jnp.stack(out).reshape(n, b, t)

    return jax.vmap(per_group, in_axes=(0, 0, 0))(tuple(state), params, xg)


def vq_decode(
    state: VQState,
    params: Optional[dict],
    indices: jnp.ndarray,           # [G, Q, B, T]
    *,
    cfg: VQTrainConfig,
) -> jnp.ndarray:
    """Sum of per-quantizer dequantizations, groups concatenated on the
    feature dim (core_vq.py:454-462,519-522). Returns [B, T, dim]."""
    g, q, b, t = indices.shape

    def per_group(state_g, params_g, idx_g):
        acc = jnp.zeros((b * t, cfg.group_dim), jnp.float32)
        for i in range(q):
            pr = (
                {k: v[i] for k, v in params_g.items()}
                if params_g is not None
                else None
            )
            acc = acc + _layer_decode(
                idx_g[i].reshape(b * t), state_g[2][i], pr
            )
        return acc.reshape(b, t, cfg.group_dim)

    out = jax.vmap(per_group, in_axes=(0, 0, 0))(tuple(state), params, indices)
    return out.transpose(1, 2, 0, 3).reshape(b, t, cfg.dim)


def make_sharded_vq_train_step(mesh, cfg: VQTrainConfig, axis: str = "dp"):
    """A jitted shard_map train step: batch sharded over ``axis``, state and
    params replicated; psum'd EMA stats keep every shard's state identical
    (and equal to the unsharded full-batch step)."""
    from jax import shard_map as smap
    from jax.sharding import PartitionSpec as P

    def step(state, params, x, rng):
        return vq_train_step(
            state, params, x, rng, cfg=cfg, axis_name=axis
        )

    rep = P()
    mapped = smap(
        step,
        mesh=mesh,
        in_specs=(rep, rep, P(axis), rep),
        out_specs=(
            VQState(rep, rep, rep, rep),
            VQOutput(P(axis), P(None, None, axis), rep),
        ),
        check_vma=False,
    )
    return jax.jit(mapped)
