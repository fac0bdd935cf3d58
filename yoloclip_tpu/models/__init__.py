from yoloclip_tpu.models.backbone import YOLOv8Backbone  # noqa: F401
from yoloclip_tpu.models.neck import RepVLPAN  # noqa: F401
from yoloclip_tpu.models.heads import TextContrastiveHead, BoxHead  # noqa: F401
from yoloclip_tpu.models.yolo_clip import YOLOCLIP  # noqa: F401
