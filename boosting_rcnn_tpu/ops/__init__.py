from . import (  # noqa: F401
    anchors,
    assigners,
    box_ops,
    coders,
    gaussian_target,
    losses,
    nms,
    roi_align,
    samplers,
)
from .anchors import AnchorGenerator, anchor_inside_flags  # noqa: F401
from .assigners import AssignResult, atss_assign, max_iou_assign  # noqa: F401
from .box_ops import (  # noqa: F401
    bbox2delta,
    bbox_overlaps,
    bbox_overlaps_aligned,
    clip_boxes,
    delta2bbox,
)
from .nms import batched_nms_padded, multiclass_nms_padded, nms_padded  # noqa: F401
from .roi_align import map_roi_levels, multilevel_roi_align  # noqa: F401
from .samplers import (  # noqa: F401
    SampleResult,
    ohem_sample,
    pseudo_sample,
    random_sample,
)
from .assigners import hungarian_assign  # noqa: F401
