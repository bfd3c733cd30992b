#!/usr/bin/env python3
"""Experiment: fused Pallas vocoder block vs the XLA conv path.

The BigVGAN vocoder's late blocks (C=192/96) are ACTIVATION-bandwidth bound:
every SnakeBeta pass between convs round-trips ~1-1.5 GB of activations
through HBM (per-stage profile in CLAUDE.md: b2 59 ms, b3 65 ms of the 215 ms
codec decode @ b32x128). This kernel computes one whole vocoder block —
snake -> transposed conv (phase-decomposed) -> 3 residual units — on a
VMEM-resident output tile: HBM traffic collapses to one read of the input
tile + one write of the output tile.

Tiling: grid (B, T_out/T_TILE). Each step loads an input tile with a left
halo (receptive field of the in-kernel chain), computes the extended output
tile, and writes only the valid [H:] tail. Left halo rows carry garbage that
never propagates past H (causal convs only look left).

Run: python scripts/exp_pallas_vocoder.py [--block b3] [--check]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------------
# Fused block kernel
# --------------------------------------------------------------------------

def _snake_poly(x32, alpha, beta):
    """Same mod-pi + degree-9 polynomial sin^2 as ops/snake.py (bf16 path)."""
    u = x32 * alpha
    r = u - 3.141592653589793 * jnp.round(u * 0.3183098861837907)
    r = jnp.clip(r, -1.5707964, 1.5707964)
    r2 = r * r
    s = r * (1.0 + r2 * (-1.0 / 6.0 + r2 * (1.0 / 120.0 + r2 * (
        -1.0 / 5040.0 + r2 * (1.0 / 362880.0)))))
    return x32 + (s * s) / (beta + 1e-9)


def _shift_down(a, n):
    """a[t] -> a[t - n]; rows [0, n) become zeros. (pltpu.roll would do, but
    Mosaic can't rotate non-32-bit data; zeros land in the discarded halo.)"""
    if n == 0:
        return a
    return jnp.concatenate([jnp.zeros((n, a.shape[1]), a.dtype), a[:-n]],
                           axis=0)


def make_block_kernel(*, s, k, c_in, c_out, dils, t_tile, halo, tin_ext):
    """Returns the kernel fn. Static geometry:
    s: upsample rate; k: tconv taps (2*s); dils: resunit dilations;
    t_tile: output samples written per grid step; halo: extra left samples
    computed and discarded (>= receptive field of the resunit chain);
    tin_ext: input rows DMA'd per step ( (t_tile+halo)/s + 1 )."""
    l_ext = t_tile + halo          # extended output rows computed
    tin_main = t_tile // s         # input stride per grid step

    def kernel(x_hbm, blk_a, blk_b, tc_w, tc_b,
               u_a1, u_b1, u_w1, u_c1, u_a2, u_b2, u_w2, u_c2,
               out_ref, x_vmem, sem):
        b = pl.program_id(0)
        q = pl.program_id(1)
        # ---- input tile DMA (left halo included; x is pre-padded) -------
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(q * tin_main, tin_ext), :], x_vmem, sem)
        cp.start()
        cp.wait()

        x = x_vmem[:, :]                                   # [tin_ext, c_in]
        x32 = x.astype(jnp.float32)
        # ---- block snake (C_in) -----------------------------------------
        x32 = _snake_poly(x32, blk_a[0, :], blk_b[0, :])
        xb = x32.astype(jnp.bfloat16)

        # ---- transposed conv, phase-decomposed --------------------------
        # stored W'[j,i,o] = W_torch[i,o,K-1-j]; out[q*s+p] =
        #   x[q] @ Wt[:,:,p] + x[q-1] @ Wt[:,:,p+s]   (k = 2s)
        xm1 = _shift_down(xb, 1)
        phases = []
        for p in range(s):
            o = jnp.dot(xb, tc_w[k - 1 - p], preferred_element_type=jnp.float32)
            o = o + jnp.dot(xm1, tc_w[k - 1 - p - s],
                            preferred_element_type=jnp.float32)
            phases.append(o)
        # interleave phases: [tin_ext, s, c_out] -> [tin_ext*s, c_out]
        h = jnp.stack(phases, axis=1).reshape(tin_ext * s, c_out)
        h = h + tc_b[0, :]
        # drop the rows below the extended tile (tconv consumed x[q-1])
        h = h[tin_ext * s - l_ext:]                         # [l_ext, c_out]
        hb = h.astype(jnp.bfloat16)

        # Pre-sequence rows must be EXACT zeros for the first tile so the
        # resunit convs see the reference's causal zero-padding (the halo of
        # tile 0 otherwise carries bias-propagated values).
        row = jax.lax.broadcasted_iota(jnp.int32, (l_ext, 1), 0)
        real = (row >= halo) | (q > 0)

        def zfix(arr):
            return jnp.where(real, arr, jnp.zeros_like(arr))

        hb = zfix(hb)

        # ---- residual units ---------------------------------------------
        # Rounding discipline mirrors the XLA path op-for-op (every conv
        # output casts to bf16, every snake reads bf16) so the two paths are
        # comparable to matmul-order noise.
        for i, d in enumerate(dils):
            a32 = _snake_poly(hb.astype(jnp.float32), u_a1[i, :], u_b1[i, :])
            ab = a32.astype(jnp.bfloat16)
            # causal conv k=3 dilation d: c1[t] = sum_tap a[t-(2-tap)d] @ W[tap]
            c1 = jnp.dot(_shift_down(ab, 2 * d), u_w1[i, 0],
                         preferred_element_type=jnp.float32)
            c1 += jnp.dot(_shift_down(ab, d), u_w1[i, 1],
                          preferred_element_type=jnp.float32)
            c1 += jnp.dot(ab, u_w1[i, 2], preferred_element_type=jnp.float32)
            c1 += u_c1[i, :]
            c1b = c1.astype(jnp.bfloat16)
            b32 = _snake_poly(c1b.astype(jnp.float32), u_a2[i, :], u_b2[i, :])
            c2 = jnp.dot(b32.astype(jnp.bfloat16), u_w2[i],
                         preferred_element_type=jnp.float32)
            c2 += u_c2[i, :]
            hb = zfix(hb + c2.astype(jnp.bfloat16))

        out_ref[0] = hb[halo:]

    return kernel


def fused_block(x, params, *, s, dils, t_tile, halo, interpret=False):
    """x: [B, T_in, C_in] bf16 -> [B, T_in*s, C_out] bf16.

    params: dict with block alpha/beta, tconv_w [k,Cin,Cout] (stored layout),
    tconv_b, and stacked unit params (w1 [U,3,C,C], w2 [U,C,C], ...).
    """
    bsz, t_in, c_in = x.shape
    k = params["tconv_w"].shape[0]
    c_out = params["tconv_w"].shape[2]
    assert k == 2 * s
    tin_main = t_tile // s
    # DMA slice length must be sublane-aligned (16 for bf16); the output
    # mapping only depends on pad_l = tin_ext - tin_main, so rounding up just
    # extends the discarded halo.
    tin_ext = ((t_tile + halo) // s + 1 + 15) // 16 * 16
    n_t = t_in // tin_main * s * tin_main // t_tile  # == t_in*s/t_tile
    assert t_in * s % t_tile == 0

    # pre-pad: halo/s + 1 zeros at left, right pad so the last DMA fits.
    # The manually-DMA'd input also needs a 128-aligned channel dim (Mosaic
    # slice tiling); pad with zero channels and zero tconv-weight rows.
    c_dma = (c_in + 127) // 128 * 128
    pad_l = tin_ext - tin_main
    need = (n_t - 1) * tin_main + tin_ext
    pad_r = max(0, need - (t_in + pad_l))
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, c_dma - c_in)))
    tconv_w = jnp.pad(params["tconv_w"], ((0, 0), (0, c_dma - c_in), (0, 0)))
    blk_a = jnp.pad(params["alpha"].reshape(1, -1),
                    ((0, 0), (0, c_dma - c_in)), constant_values=1.0)
    blk_b = jnp.pad(params["beta"].reshape(1, -1),
                    ((0, 0), (0, c_dma - c_in)), constant_values=1.0)

    kernel = make_block_kernel(s=s, k=k, c_in=c_dma, c_out=c_out, dils=dils,
                               t_tile=t_tile, halo=halo, tin_ext=tin_ext)

    def vspec(shape):
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    f32 = jnp.float32
    args = (
        xp,
        blk_a.astype(f32),
        blk_b.astype(f32),
        tconv_w.astype(jnp.bfloat16),
        params["tconv_b"].reshape(1, -1).astype(f32),
        params["u_a1"].astype(f32), params["u_b1"].astype(f32),
        params["u_w1"].astype(jnp.bfloat16),
        params["u_c1"].astype(f32),
        params["u_a2"].astype(f32), params["u_b2"].astype(f32),
        params["u_w2"].astype(jnp.bfloat16),
        params["u_c2"].astype(f32),
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)] + [
        vspec(a.shape) for a in args[1:]
    ]
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_t),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, t_tile, c_out), lambda b, q: (b, q, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t_in * s, c_out), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((tin_ext, c_dma), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(*args)
    return out


# --------------------------------------------------------------------------
# Reference XLA path (same math as models/codec.py)
# --------------------------------------------------------------------------

def xla_block(x, params, *, s, dils):
    from qwen_tts_tpu.models.codec import _resunit
    from qwen_tts_tpu.ops.convs import causal_conv_transpose1d
    from qwen_tts_tpu.ops.snake import snake_beta

    h = snake_beta(x, params["alpha"], params["beta"])
    h = causal_conv_transpose1d(h, params["tconv_w"], params["tconv_b"],
                                stride=s)
    for i, d in enumerate(dils):
        unit = {
            "alpha1": params["u_a1"][i, 0], "beta1": params["u_b1"][i, 0],
            "conv1_w": params["u_w1"][i].transpose(0, 1, 2),
            "conv1_b": params["u_c1"][i, 0],
            "alpha2": params["u_a2"][i, 0], "beta2": params["u_b2"][i, 0],
            "conv2_w": params["u_w2"][i][None],
            "conv2_b": params["u_c2"][i, 0],
        }
        h = _resunit(unit, h, d)
    return h


def make_params(rng, c_in, c_out, s, n_units=3):
    k = 2 * s
    keys = jax.random.split(rng, 8)
    u = n_units

    def w(key, shape, fan):
        return jax.random.normal(key, shape, jnp.float32) / jnp.sqrt(fan)

    return {
        "alpha": jnp.abs(w(keys[0], (c_in,), 1)) + 0.5,
        "beta": jnp.abs(w(keys[1], (c_in,), 1)) + 0.5,
        "tconv_w": w(keys[2], (k, c_in, c_out), c_in * 2),
        "tconv_b": jnp.zeros((c_out,)) + 0.01,
        "u_a1": jnp.abs(w(keys[3], (u, 1, c_out), 1)) + 0.5,
        "u_b1": jnp.abs(w(keys[3], (u, 1, c_out), 1)) + 0.5,
        "u_w1": w(keys[4], (u, 3, c_out, c_out), c_out * 3),
        "u_c1": jnp.zeros((u, 1, c_out)) + 0.01,
        "u_a2": jnp.abs(w(keys[5], (u, 1, c_out), 1)) + 0.5,
        "u_b2": jnp.abs(w(keys[6], (u, 1, c_out), 1)) + 0.5,
        "u_w2": w(keys[7], (u, c_out, c_out), c_out),
        "u_c2": jnp.zeros((u, 1, c_out)) + 0.01,
    }


BLOCKS = {
    # name: (c_in, c_out, rate, T_in @128 frames b32, t_tile, halo)
    "b2": (384, 192, 4, 20480, 2048, 64),
    "b3": (192, 96, 3, 81920, 3072, 48),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--block", default="b3")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--check", action="store_true")
    p.add_argument("--interpret", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from qwen_tts_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    c_in, c_out, s, t_in, t_tile, halo = BLOCKS[args.block]
    dils = (1, 3, 9)
    if args.check:
        t_in = t_tile // s * 2  # small: two tiles
        bsz = 2
    else:
        bsz = args.batch

    rng = jax.random.PRNGKey(0)
    params = make_params(jax.random.fold_in(rng, 1), c_in, c_out, s)
    x = (jax.random.normal(jax.random.fold_in(rng, 2), (bsz, t_in, c_in))
         * 0.5).astype(jnp.bfloat16)

    fused = jax.jit(functools.partial(
        fused_block, s=s, dils=dils, t_tile=t_tile, halo=halo,
        interpret=args.interpret))
    ref = jax.jit(functools.partial(xla_block, s=s, dils=dils))

    if args.check:
        got = fused(x, params)
        want = ref(x, params)
        print("shapes", got.shape, want.shape)
        g = got.astype(jnp.float32)
        w_ = want.astype(jnp.float32)
        err = jnp.max(jnp.abs(g - w_)) / (jnp.max(jnp.abs(w_)) + 1e-9)
        print(f"rel max err: {float(err):.3e}")
        assert got.shape == want.shape
        return

    for name, fn in (("xla", ref), ("pallas", fused)):
        out = fn(x, params)
        float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        runs = 5
        for _ in range(runs):
            out = fn(x, params)
            float(jnp.sum(out.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / runs
        gb = (x.size + out.size) * 2 / 1e9
        print(f"{name:7s} {dt*1e3:8.2f} ms   io {gb/dt:6.0f} GB/s")


if __name__ == "__main__":
    main()
