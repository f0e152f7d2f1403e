from ct_tpu.data.targets import PaddedTargets, pad_targets  # noqa: F401
from ct_tpu.data.augment import (  # noqa: F401
    EvalTransform, RawCanvasTransform, TrainAugment,
)
from ct_tpu.data.loader import Loader  # noqa: F401
from ct_tpu.data.voc import (  # noqa: F401
    AnnotationTransform, VOCDetection, VOC_CLASSES,
)
from ct_tpu.data.coco import COCODetection, CocoIndex  # noqa: F401
