from tpuseg.metrics.online import (  # noqa: F401
    dice_coeff,
    iou_coeff,
    multiclass_dice_coeff,
    multiclass_dice_coeff_v2,
    multiclass_iou_coeff,
    multiclass_iou_coeff_v2,
    accuracy,
    mse,
    nrmse,
    psnr,
)
from tpuseg.metrics.seg3d import SegMetric3d, Seg_Metirc3d  # noqa: F401
from tpuseg.losses.ssim import ssim  # noqa: F401
