from spfsplatv2_tpu.data.dataset import (  # noqa: F401
    ChunkedSceneDataset,
    DatasetConfig,
    collate,
)
from spfsplatv2_tpu.data.view_samplers import (  # noqa: F401
    BoundedSamplerConfig,
    make_view_sampler,
)
