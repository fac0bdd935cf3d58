"""Probe: is storing INTER-BLOCK activations as int8 in HBM a win?

Round-2 verdict next #3: the int8 deploy pipeline is HBM-bound (80% BW,
19% MXU); eligible convs currently dequantize to a bf16 SiLU output in HBM
and the next eligible conv re-quantizes on read. Folding SiLU+requantize
into the producer's epilogue keeps the edge tensor int8 -- half the bytes
written AND read on that edge.

Probe methodology per CLAUDE.md: chained ops inside ONE jit (lax.fori_loop)
with a scalar-reduced (1,1) output of the SAME dtype on every path, async
dispatch + one final fetch for timing. Run on the real TPU:

    JAX_PLATFORMS='' python benchmarks/probe_int8_edges.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from yoloclip_tpu.utils.general import enable_compile_cache

K_STEPS = 24          # chained conv blocks inside one jit


def _int8_conv(xq, wq, scale):
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * scale


def chain_bf16_edges(x0, wq, wscale, act_scale):
    """Current scheme: eligible int8 conv, bf16 edge between blocks.
    Each step: bf16 -> quantize -> s8 conv -> dequant+SiLU -> bf16."""
    def body(_, x):
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / act_scale),
                      -127, 127).astype(jnp.int8)
        y = _int8_conv(xq, wq, wscale * act_scale)
        return jax.nn.silu(y).astype(jnp.bfloat16)
    x = jax.lax.fori_loop(0, K_STEPS, body, x0.astype(jnp.bfloat16))
    return jnp.sum(x.astype(jnp.float32)).reshape(1, 1)


def chain_int8_edges(x0, wq, wscale, out_scale):
    """Proposed: SiLU + requantize folded into the producer epilogue;
    the edge tensor is int8. Each step: s8 -> conv -> dequant+SiLU ->
    requantize -> s8."""
    def body(_, xq):
        y = _int8_conv(xq, wq, wscale * out_scale)
        y = jax.nn.silu(y)
        return jnp.clip(jnp.round(y / out_scale), -127, 127).astype(jnp.int8)
    xq0 = jnp.clip(jnp.round(x0.astype(jnp.float32) / out_scale),
                   -127, 127).astype(jnp.int8)
    xq = jax.lax.fori_loop(0, K_STEPS, body, xq0)
    return jnp.sum(xq.astype(jnp.float32)).reshape(1, 1)


def chain_float_bf16(x0, wf):
    """Ineligible-block baseline: bf16 conv, bf16 edges."""
    def body(_, x):
        y = jax.lax.conv_general_dilated(
            x, wf, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)
        return jax.nn.silu(y).astype(jnp.bfloat16)
    x = jax.lax.fori_loop(0, K_STEPS, body, x0.astype(jnp.bfloat16))
    return jnp.sum(x.astype(jnp.float32)).reshape(1, 1)


def chain_float_int8_store(x0, wf, s):
    """Ineligible-block variant: bf16 conv COMPUTE, int8 edge STORAGE
    (dequant on read fused into the consumer, quantize on write into the
    producer epilogue)."""
    def body(_, xq):
        x = xq.astype(jnp.bfloat16) * jnp.bfloat16(s)
        y = jax.lax.conv_general_dilated(
            x, wf, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)
        y = jax.nn.silu(y)
        return jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    xq0 = jnp.clip(jnp.round(x0.astype(jnp.float32) / s),
                   -127, 127).astype(jnp.int8)
    xq = jax.lax.fori_loop(0, K_STEPS, body, xq0)
    return jnp.sum(xq.astype(jnp.float32)).reshape(1, 1)


def time_fn(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)                      # the ONE sync fetch
    return (time.perf_counter() - t0) / iters


def main():
    enable_compile_cache()
    r = np.random.RandomState(0)
    print(f'backend: {jax.default_backend()}  K={K_STEPS}')

    # --- eligible-conv shapes (deploy geometry, bs=32, variant n) -----
    for (B, H, C) in [(32, 80, 64), (32, 40, 128), (32, 20, 256)]:
        x0 = jnp.asarray(r.rand(B, H, H, C).astype(np.float32))
        wq = jnp.asarray(r.randint(-127, 128, (3, 3, C, C)).astype(np.int8))
        wscale = jnp.float32(0.01)
        a = time_fn(jax.jit(chain_bf16_edges), x0, wq, wscale,
                    jnp.float32(0.05))
        b = time_fn(jax.jit(chain_int8_edges), x0, wq, wscale,
                    jnp.float32(0.05))
        print(f'int8 conv c{C}@{H}: bf16-edge {a*1e3:7.2f} ms   '
              f'int8-edge {b*1e3:7.2f} ms   speedup {a/b:5.2f}x')

    # --- ineligible (float) conv shapes: early narrow layers ----------
    for (B, H, C) in [(32, 160, 32), (32, 80, 64)]:
        x0 = jnp.asarray(r.rand(B, H, H, C).astype(np.float32))
        wf = jnp.asarray(r.rand(3, 3, C, C).astype(np.float32) * 0.05
                         ).astype(jnp.bfloat16)
        a = time_fn(jax.jit(chain_float_bf16), x0, wf)
        b = time_fn(jax.jit(chain_float_int8_store), x0, wf, 0.05)
        print(f'bf16 conv c{C}@{H}: bf16-edge {a*1e3:7.2f} ms   '
              f'int8-store {b*1e3:7.2f} ms   speedup {a/b:5.2f}x')


if __name__ == '__main__':
    main()
