from spfsplatv2_tpu.evaluation.metrics import (  # noqa: F401
    compute_pose_error,
    compute_psnr,
    compute_ssim,
)
from spfsplatv2_tpu.evaluation.benchmarker import Benchmarker  # noqa: F401
