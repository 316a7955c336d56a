from spfsplatv2_tpu.losses.mse import mse_loss  # noqa: F401
from spfsplatv2_tpu.losses.reproj import ReprojConfig, reproj_loss  # noqa: F401
from spfsplatv2_tpu.losses.ssim import ssim  # noqa: F401
