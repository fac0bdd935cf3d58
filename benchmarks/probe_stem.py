"""Probe: is a space-to-depth stem faster than the 3x3/s2 C=3 stem?

The backbone's first conv reads the largest tensor in the network
(B,640,640,3) with only THREE input channels -- an MXU-hostile shape
(the systolic array contracts over >=8-lane blocks, so C=3 wastes most
of the contraction dim). The classic TPU fix (MLPerf ResNet) rewrites a
k3/s2 conv on (H,W,3) as an EXACT k2/s1 conv on the space-to-depth
layout (H/2,W/2,12): O(i,j) only touches input rows {2i-1..2i+1}, which
live in s2d rows {i-1,i}, so a 2x2 kernel over 12 channels covers the
full receptive field (7 of the 16 taps are structurally zero).

Variants timed (real TPU, async dispatch + one scalar fetch -- the
tunnel RTT cancels across same-shape outputs):
  read      -- input -> scalar sum (read-cost floor)
  plain     -- conv 3x3 s2 C3->16 + SiLU (the current stem)
  s2d       -- transpose to (H/2,W/2,12) in-graph, conv 2x2 s1 + SiLU
  s2d_pre   -- input ALREADY s2d (the device letterbox gather could emit
               this layout for free), conv 2x2 s1 + SiLU
  plain_u8  -- uint8 input, /255 folded into the conv weights (measures
               a 1-byte canvas edge between letterbox and stem)
  s2d_pre_u8-- both tricks combined

Run: JAX_PLATFORMS='' python -u benchmarks/probe_stem.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from yoloclip_tpu.utils.general import enable_compile_cache


def _conv(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32)


def _time(fn, *args, iters=30, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def s2d(x):
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--size', type=int, default=640)
    ap.add_argument('--cout', type=int, default=16)
    ap.add_argument('--iters', type=int, default=30)
    args = ap.parse_args()
    enable_compile_cache()

    B, S, CO = args.batch, args.size, args.cout
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, S, S, 3), jnp.bfloat16)
    xu8 = (np.asarray(x, np.float32) * 255).astype(np.uint8)
    xu8 = jnp.asarray(xu8)
    x_s2d = s2d(x)
    xu8_s2d = s2d(xu8)
    w3 = jnp.asarray(rng.randn(3, 3, 3, CO) * 0.1, jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(2, 2, 12, CO) * 0.1, jnp.bfloat16)

    @jax.jit
    def read(x):
        return jnp.sum(x.astype(jnp.float32)).reshape(1, 1)

    @jax.jit
    def plain(x):
        y = _conv(x, w3, 2, ((1, 1), (1, 1)))
        return jnp.sum(jax.nn.silu(y)).reshape(1, 1)

    @jax.jit
    def s2d_in_graph(x):
        y = _conv(s2d(x), w2, 1, ((1, 0), (1, 0)))
        return jnp.sum(jax.nn.silu(y)).reshape(1, 1)

    @jax.jit
    def s2d_pre(xs):
        y = _conv(xs, w2, 1, ((1, 0), (1, 0)))
        return jnp.sum(jax.nn.silu(y)).reshape(1, 1)

    @jax.jit
    def plain_u8(xu):
        y = _conv(xu.astype(jnp.bfloat16), w3 * (1.0 / 255.0),
                  2, ((1, 1), (1, 1)))
        return jnp.sum(jax.nn.silu(y)).reshape(1, 1)

    @jax.jit
    def s2d_pre_u8(xu):
        y = _conv(xu.astype(jnp.bfloat16), w2 * (1.0 / 255.0),
                  1, ((1, 0), (1, 0)))
        return jnp.sum(jax.nn.silu(y)).reshape(1, 1)

    cases = [('read', read, x), ('plain', plain, x),
             ('s2d', s2d_in_graph, x), ('s2d_pre', s2d_pre, x_s2d),
             ('plain_u8', plain_u8, xu8), ('s2d_pre_u8', s2d_pre_u8, xu8_s2d)]
    out = {}
    for name, fn, arg in cases:
        dt = _time(fn, arg, iters=args.iters)
        out[name] = round(dt * 1e3, 3)
        print(f'{name:11s} {dt * 1e3:7.3f} ms', flush=True)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
