"""Pallas TPU kernels (hot ops where XLA fusion isn't enough)."""

from yoloclip_tpu.ops.pallas.similarity import (fused_projected_similarity_argmax,
                                                fused_similarity_argmax,
                                                similarity_argmax_reference)

__all__ = ['fused_projected_similarity_argmax', 'fused_similarity_argmax',
           'similarity_argmax_reference']
