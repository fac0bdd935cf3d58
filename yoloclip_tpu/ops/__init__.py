from yoloclip_tpu.ops.preprocess import letterbox  # noqa: F401
from yoloclip_tpu.ops.nms import batched_nms, nms_fixed  # noqa: F401
