from yoloclip_tpu.data.coco import COCODataset  # noqa: F401
from yoloclip_tpu.data.loader import DataLoader, collate  # noqa: F401
