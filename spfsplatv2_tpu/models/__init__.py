"""Encoder registry: name -> encoder variant.

TPU-native equivalent of the reference registry
(reference: src/model/encoder/__init__.py:9-22).  Three variants:

  * "spfsplat"    — v1 (ICCV SPFSplat): unmasked croco_multi backbone
  * "spfsplatv2"  — flagship: masked CroCo backbone + pose tokens
  * "spfsplatv2l" — VGGT-1B backbone

`EncoderSelectorConfig` is the config-side discriminated selector (the
YAML/CLI surface is `encoder.name=... encoder.<name>.<field>=...`), and
`get_encoder` instantiates the chosen flax module.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from spfsplatv2_tpu.models.encoder import SPFSplatV2Config, SPFSplatV2Encoder
from spfsplatv2_tpu.models.encoder_spfsplat import (
    SPFSplatConfig,
    SPFSplatEncoder,
)
from spfsplatv2_tpu.models.encoder_vggt import (
    SPFSplatV2LConfig,
    SPFSplatV2LEncoder,
)

ENCODERS = {
    "spfsplat": SPFSplatEncoder,
    "spfsplatv2": SPFSplatV2Encoder,
    "spfsplatv2l": SPFSplatV2LEncoder,
}


@dataclass(frozen=True)
class EncoderSelectorConfig:
    name: str = "spfsplatv2"
    spfsplat: SPFSplatConfig = field(default_factory=SPFSplatConfig)
    spfsplatv2: SPFSplatV2Config = field(default_factory=SPFSplatV2Config)
    spfsplatv2l: SPFSplatV2LConfig = field(default_factory=SPFSplatV2LConfig)

    @property
    def variant_cfg(self):
        if self.name not in ENCODERS:
            raise KeyError(
                f"unknown encoder {self.name!r}; options: {sorted(ENCODERS)}"
            )
        return getattr(self, self.name)


def get_encoder(cfg: EncoderSelectorConfig):
    """Instantiate the configured encoder variant (a flax module)."""
    return ENCODERS[cfg.name](cfg.variant_cfg)
