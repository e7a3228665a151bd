from lpi_tpu.ops.kmeans import kmeans  # noqa: F401
from lpi_tpu.ops.boxes import box_giou, box_iou, decode_boxes, encode_boxes  # noqa: F401
from lpi_tpu.ops.nms import ml_nms_mask, nms_mask, nms_padded, soft_nms  # noqa: F401
from lpi_tpu.ops.focal import sigmoid_focal_loss, token_sigmoid_focal_loss  # noqa: F401
from lpi_tpu.ops.deform_conv import (  # noqa: F401
    deform_conv2d,
    deform_conv2d_fast,
    deform_conv2d_pallas,
    deform_conv2d_window,
)
from lpi_tpu.ops.deform_pool import deform_psroi_pool  # noqa: F401
from lpi_tpu.ops.roi_align import roi_align, roi_pool  # noqa: F401
