from spfsplatv2_tpu.geometry import se3, projection, pointcloud  # noqa: F401
