from yoloclip_tpu.inference.detector import YOLOCLIPDetector  # noqa: F401
