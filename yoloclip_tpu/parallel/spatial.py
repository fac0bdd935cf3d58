"""Spatially-partitioned inference: N chips cooperate on ONE image.

'data'-axis batch sharding (parallel/train_step.py, inference/server.py)
scales THROUGHPUT but cannot reduce the latency of a single frame. This
module shards the image HEIGHT axis over the mesh instead, so the
conv-dominated backbone/neck of one forward pass splits across chips.
XLA's SPMD partitioner inserts the halo exchanges convolutions need at
partition boundaries (collective-permutes over ICI) automatically -- the
model code is untouched; the whole feature is sharding annotation (the
scaling-book recipe: annotate, let XLA choose collectives).

No reference equivalent (SURVEY §2.2: the reference has zero distributed
support -- its only multi-device surface is CUDA_VISIBLE_DEVICES).

Design notes:

  * Single-image latency mode (`spatialize_detector`): the (1, H, W, 3)
    canvas is sharded P(None, ('data', 'model'), None, None) -- BOTH mesh
    axes fold into the height split, so a 2x4 serving mesh gives an
    8-way spatial partition of one frame.
  * Combined mode (`canvas_sharding(..., batch_axis='data',
    height_axis='model')`): batch over 'data' x height over 'model' for
    simultaneous throughput + latency scaling of the batched program.
  * The anchor-level tail (similarity, DFL decode, NMS) runs on (A, ...)
    tensors -- 8400 rows at 640px, microscopic next to the backbone's
    feature maps -- so GSPMD's reshard at the flatten boundary is cheap.
    On TPU the Pallas fused-similarity kernel is an opaque custom call
    GSPMD cannot split; it replicates the (tiny) scoring work per chip,
    which is numerically identical to single-chip.
  * Efficiency scales with resolution: halo rows are a constant per
    partition boundary, so wider/taller inputs amortize them better.
    Deep stages (H/32 rows) sit near the halo floor -- prefer 2-4 way
    spatial splits at 640px; batch ('data') sharding remains the
    throughput tool.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AxisName = Union[str, Sequence[str]]


def canvas_sharding(mesh: Mesh,
                    batch_axis: Optional[AxisName] = None,
                    height_axis: AxisName = ('data', 'model')
                    ) -> NamedSharding:
    """NamedSharding for an NHWC canvas: batch over `batch_axis` (None =
    unsharded), height over `height_axis` (a mesh axis name or tuple of
    names to fold together)."""
    return NamedSharding(mesh, P(batch_axis, height_axis, None, None))


def replicate_variables(variables, mesh: Mesh):
    """device_put the model variables fully replicated over the mesh
    (spatial partitioning shards activations, never weights)."""
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl),
                                  variables)


def spatialize_detector(detector, mesh: Mesh,
                        height_axis: AxisName = ('data', 'model'),
                        batch_axis: Optional[AxisName] = None):
    """Rebuild `detector`'s jitted programs with spatial sharding.

    After this call the detector's shape-stable single-image program
    (`detect()` via the host-letterbox canvas path) partitions each
    frame's height over `height_axis`, and `detect_batch()` shards batch
    over `batch_axis` (if given) x height over `height_axis`. Variables
    are replicated onto the mesh. Returns the detector (mutated in
    place).

    The device-letterbox `_detect_fn` (per-input-shape recompiles) is
    left single-device: ad-hoc shapes would multiply sharded
    compilations for no serving benefit.
    """
    single = canvas_sharding(mesh, batch_axis=None, height_axis=height_axis)
    names = ((height_axis,) if isinstance(height_axis, str)
             else tuple(height_axis))
    if batch_axis is not None:
        # a mesh axis cannot shard two dims at once: drop the batch axis
        # from the batched program's height split
        names = tuple(a for a in names if a != batch_axis)
    batched_h: Optional[AxisName] = (
        None if not names else names[0] if len(names) == 1 else names)
    batched = canvas_sharding(mesh, batch_axis=batch_axis,
                              height_axis=batched_h)
    detector.variables = replicate_variables(detector.variables, mesh)
    detector._detect_canvas_fn = detector._build_detect_canvas_fn(
        canvas_sharding=single)
    detector._detect_batch_fn = detector._build_detect_batch_fn(
        canvas_sharding=batched)
    detector.spatial_mesh = mesh
    return detector
