"""Device-side letterbox preprocessing (jittable, fixed output shape).

Behavioral contract from
`/root/reference/yolo_clip_detector/inference/detector.py:119-161`:
  scale = min(target_h/h, target_w/w); resize to (int(h*s), int(w*s)) with
  bilinear interpolation; paste at the TOP-LEFT of a black target canvas
  (not centered); divide by 255.

TPU-first design: the whole transform is one XLA program on device -- the
uint8 HWC frame is the only host->device transfer. Output shapes depend only
on the *input* shape, so a given camera/stream resolution compiles once and
every subsequent frame hits the jit cache. Resize uses jax.image with
half-pixel alignment, matching cv2.resize(INTER_LINEAR) semantics up to
fixed-point rounding (parity within fp tolerance, not bit-exact).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(1,))
def letterbox(image: jax.Array, target_hw: Tuple[int, int] = (640, 640)
              ) -> Tuple[jax.Array, jax.Array]:
    """uint8/float (H, W, 3) -> (float32 (th, tw, 3) in [0,1], scale).

    The returned scale is the scalar min-ratio used for the resize; boxes
    predicted in letterboxed pixels divide by it to recover original-image
    coordinates (ref `detector.py:193-196` -- top-left paste means there is
    no pad offset to subtract).
    """
    h, w = image.shape[0], image.shape[1]
    th, tw = target_hw
    scale = min(th / h, tw / w)
    rh, rw = int(h * scale), int(w * scale)

    img = image.astype(jnp.float32)
    resized = jax.image.resize(img, (rh, rw, 3), method='bilinear')
    canvas = jnp.zeros((th, tw, 3), jnp.float32)
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (0, 0, 0))
    return canvas / 255.0, jnp.float32(scale)


@functools.partial(jax.jit, static_argnums=(1,))
def letterbox_batch(images: jax.Array, target_hw: Tuple[int, int] = (640, 640)
                    ) -> Tuple[jax.Array, jax.Array]:
    """(B, H, W, 3) same-size frames -> ((B, th, tw, 3), scale). For streams."""
    fn = lambda im: letterbox(im, target_hw)
    canvases, scales = jax.vmap(fn)(images)
    return canvases, scales[0]


def rescale_boxes(boxes: jax.Array, scale: jax.Array,
                  orig_hw: Tuple[int, int]) -> jax.Array:
    """Letterboxed-pixel xyxy -> original-image xyxy with boundary clip.

    Ref `detector.py:193-202`: divide by scale, clip to [0, orig_w/h].
    """
    oh, ow = orig_hw
    boxes = boxes / scale
    lo = jnp.zeros(4, boxes.dtype)
    hi = jnp.asarray([ow, oh, ow, oh], boxes.dtype)
    return jnp.clip(boxes, lo, hi)
