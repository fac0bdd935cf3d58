from yoloclip_tpu.inference.detector import YOLOCLIPDetector  # noqa: F401
from yoloclip_tpu.inference.server import DetectionServer  # noqa: F401
