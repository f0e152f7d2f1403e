from ct_tpu.ops import boxes, priors  # noqa: F401
from ct_tpu.ops.detection import (  # noqa: F401
    decode_and_fuse, fuse_scores, postprocess,
)
from ct_tpu.ops.losses import multibox_loss, multibox_loss_sums  # noqa: F401
from ct_tpu.ops.matching import MatchResult, match_batch  # noqa: F401
from ct_tpu.ops.nms import Detections, batched_nms, nms_numpy  # noqa: F401
