from livecell_tpu.ops.boxes import (  # noqa: F401
    box_iou,
    clip_boxes,
    encode_boxes,
    small_box_mask,
)
from livecell_tpu.ops.anchors import generate_anchors  # noqa: F401
from livecell_tpu.ops.interp import (  # noqa: F401
    resize_weight_matrix,
    crop_resize_matrices,
)
from livecell_tpu.ops.roi_align import roi_align  # noqa: F401
from livecell_tpu.ops.nms import nms_fixed  # noqa: F401
from livecell_tpu.ops.proposals import (  # noqa: F401
    training_proposals,
    inference_proposals,
    sample_rows,
)
from livecell_tpu.ops.mask_ops import (  # noqa: F401
    extract_mask_targets,
    paste_masks,
    resize_bilinear,
)
