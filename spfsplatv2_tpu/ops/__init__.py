from spfsplatv2_tpu.ops.rasterizer import RasterizerConfig, RenderOutput, render  # noqa: F401
