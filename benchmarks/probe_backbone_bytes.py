"""Backbone roofline localization (real TPU).

After the round-3 score-path folds the backbone is the largest remaining
slice of the serve pipeline (~8 ms of ~18 ms int8 bs=32). This probe
answers WHERE that time sits relative to the chip's two ceilings, per
backbone stage:

  * cumulative stage programs (stem -> stage1_conv -> ... -> sppf) via
    `capture_intermediates` + scalar reduce, so XLA dead-code-eliminates
    everything later (same method as probe_int8_stages.py);
  * per-stage DELTA wall time (async dispatch, tunnel RTT cancels);
  * per-stage DELTA bytes + flops from `compiled.cost_analysis()`;
  * derived: achieved GB/s vs the v5e 819 GB/s HBM roof and achieved
    TFLOP/s vs the 197 (bf16) / 394 (int8) MXU roof.

A stage whose delta time tracks bytes/819 GB/s is bandwidth-bound (only
deeper fusion / fewer edges can help); one far above both rooflines is
utilization-bound (narrow channels underfilling the MXU -- a layout
restructure like space-to-depth would be the lever).

Usage:  JAX_PLATFORMS='' python -u benchmarks/probe_backbone_bytes.py \
            [--batch 32] [--variant n] [--int8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from yoloclip_tpu.utils.general import enable_compile_cache

HBM_GBPS = 819.0
MXU_TFLOPS = {'bf16': 197.0, 'int8': 394.0}


def _tree_scalar(x):
    leaves = jax.tree.leaves(x)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves
               if hasattr(l, 'astype'))


def _time(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)            # one sync fetch (block_until_ready unreliable)
    return (time.perf_counter() - t0) / iters


BACKBONE_STAGES = ['stem', 'stage1_conv', 'stage1_csp', 'stage2_conv',
                   'stage2_csp', 'stage3_conv', 'stage3_csp', 'stage4_conv',
                   'stage4_csp', 'stage4_sppf']


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--variant', default='n')
    ap.add_argument('--size', type=int, default=640)
    ap.add_argument('--int8', action='store_true')
    ap.add_argument('--iters', type=int, default=20)
    args = ap.parse_args()

    enable_compile_cache()
    from yoloclip_tpu.config import ModelConfig
    from yoloclip_tpu.models.yolo_clip import YOLOCLIP

    S = args.size
    cfg = ModelConfig(backbone_variant=args.variant, image_size=(S, S),
                      dtype='bfloat16')
    model = YOLOCLIP(cfg)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (args.batch, S, S, 3),
                                jnp.float32).astype(jnp.bfloat16)
    text = jax.random.normal(jax.random.PRNGKey(1), (80, 512))
    text = (text / jnp.linalg.norm(text, axis=-1, keepdims=True)
            ).astype(jnp.bfloat16)
    variables = model.init(rng, images[:1], text)
    tag = 'bf16'
    if args.int8:
        from yoloclip_tpu.ops.quantize import quantize_model
        model, variables = quantize_model(
            cfg, variables, [(images[:8].astype(jnp.float32), text)])
        tag = 'int8'

    def upto(stage_idx):
        """Jitted program covering the backbone up to stage_idx inclusive."""
        names = set(BACKBONE_STAGES[:stage_idx + 1])

        def fil(mdl, method):
            return mdl.name in names

        def f(variables, images, text):
            _, inter = model.apply(variables, images, text,
                                   capture_intermediates=fil,
                                   mutable=['intermediates'])
            return _tree_scalar(inter['intermediates']['backbone'])
        return jax.jit(f)

    rows = []
    prev_t, prev_b, prev_f = 0.0, 0.0, 0.0
    for i, stage in enumerate(BACKBONE_STAGES):
        fn = upto(i)
        lowered = fn.lower(variables, images, text)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):       # older jax returns [dict]
            ca = ca[0]
        bytes_total = float(ca.get('bytes accessed', 0.0))
        flops = float(ca.get('flops', 0.0))
        dt = _time(fn, variables, images, text, iters=args.iters)
        d_t = dt - prev_t
        d_b = bytes_total - prev_b
        d_f = flops - prev_f
        gbps = d_b / d_t / 1e9 if d_t > 0 else float('nan')
        tflops = d_f / d_t / 1e12 if d_t > 0 else float('nan')
        bw_pct = 100.0 * gbps / HBM_GBPS
        mxu_pct = 100.0 * tflops / MXU_TFLOPS[tag]
        rows.append((stage, dt, d_t, d_b, d_f, bw_pct, mxu_pct))
        print(f'{tag} {stage:12s} cum {dt*1e3:7.2f} ms  d {d_t*1e3:6.2f} ms'
              f'  dbytes {d_b/1e6:8.1f} MB  dflops {d_f/1e9:7.1f} G'
              f'  BW {bw_pct:5.1f}%  MXU {mxu_pct:5.1f}%', flush=True)
        prev_t, prev_b, prev_f = dt, bytes_total, flops

    total_b = prev_b
    total_f = prev_f
    print(f'\n{tag} backbone total: {prev_t*1e3:.2f} ms,'
          f' {total_b/1e9:.2f} GB accessed,'
          f' {total_f/1e12:.3f} TFLOP'
          f' -> {total_b/prev_t/1e9:.0f} GB/s'
          f' ({100*total_b/prev_t/1e9/HBM_GBPS:.0f}% HBM),'
          f' {total_f/prev_t/1e12:.1f} TFLOP/s'
          f' ({100*total_f/prev_t/1e12/MXU_TFLOPS[tag]:.0f}% MXU)')


if __name__ == '__main__':
    main()
