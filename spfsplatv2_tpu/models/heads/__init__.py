from spfsplatv2_tpu.models.heads.dpt import DPTHead, DPTGSHead  # noqa: F401
from spfsplatv2_tpu.models.heads.pose_head import PoseHead, PoseHeadConfig  # noqa: F401
from spfsplatv2_tpu.models.heads.postprocess import pts3d_postprocess  # noqa: F401
