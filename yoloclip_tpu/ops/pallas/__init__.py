"""Pallas TPU kernels (hot ops where XLA fusion isn't enough)."""

from yoloclip_tpu.ops.pallas.similarity import (fused_similarity_argmax,
                                                similarity_argmax_reference)

__all__ = ['fused_similarity_argmax', 'similarity_argmax_reference']
