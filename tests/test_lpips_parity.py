"""LPIPS converter-fidelity parity test.

Neither the `lpips` pip package, torchvision, nor canonical VGG weights are
present in this environment (zero egress), so this test pins the
`load_torch_lpips_weights` converter against a faithful torch
re-implementation of `lpips.LPIPS(net='vgg')` (the exact module/key layout
the reference depends on: slices of torchvision `vgg16().features` with
global indices preserved, ScalingLayer, `lin{k}.model.1` 1x1 convs) with
RANDOM weights.  When a canonical state_dict is supplied at deploy time the
same converter restores exact numerical LPIPS.

Reference call surface: src/loss/loss_lpips.py:57-84 and
src/evaluation/metrics.py:22-33.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from spfsplatv2_tpu.losses.lpips import LPIPS, load_torch_lpips_weights

# torchvision vgg16().features layout: (global_idx, in_ch, out_ch) convs,
# with ReLU after each conv and MaxPool at indices 4, 9, 16, 23.
VGG16_CONVS = [
    (0, 3, 64), (2, 64, 64),
    (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256),
    (17, 256, 512), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]
SLICE_RANGES = [(0, 4), (4, 9), (9, 16), (16, 23), (23, 30)]
LIN_CHANNELS = [64, 128, 256, 512, 512]


def _build_vgg_features():
    layers: dict[int, tnn.Module] = {}
    for idx, cin, cout in VGG16_CONVS:
        layers[idx] = tnn.Conv2d(cin, cout, 3, padding=1)
        layers[idx + 1] = tnn.ReLU(inplace=False)
    for idx in (4, 9, 16, 23):
        layers[idx] = tnn.MaxPool2d(2, 2)
    return layers


class TorchScalingLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.register_buffer(
            "shift", torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None]
        )
        self.register_buffer(
            "scale", torch.tensor([0.458, 0.448, 0.450])[None, :, None, None]
        )

    def forward(self, x):
        return (x - self.shift) / self.scale


class TorchVGGSlices(tnn.Module):
    """`lpips.pretrained_networks.vgg16` twin: slice1..slice5."""

    def __init__(self):
        super().__init__()
        layers = _build_vgg_features()
        for s, (lo, hi) in enumerate(SLICE_RANGES):
            sl = tnn.Sequential()
            for idx in range(lo, hi):
                if idx in layers:
                    sl.add_module(str(idx), layers[idx])
            setattr(self, f"slice{s + 1}", sl)

    def forward(self, x):
        feats = []
        for s in range(5):
            x = getattr(self, f"slice{s + 1}")(x)
            feats.append(x)
        return feats


class TorchLinLayer(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.model = tnn.Sequential(
            tnn.Dropout(), tnn.Conv2d(cin, 1, 1, bias=False)
        )

    def forward(self, x):
        return self.model(x)


class TorchLPIPS(tnn.Module):
    """Faithful `lpips.LPIPS(net='vgg')` forward with random weights."""

    def __init__(self):
        super().__init__()
        self.scaling_layer = TorchScalingLayer()
        self.net = TorchVGGSlices()
        for s, c in enumerate(LIN_CHANNELS):
            setattr(self, f"lin{s}", TorchLinLayer(c))

    @staticmethod
    def _normalize(x, eps=1e-10):
        norm = torch.sqrt(torch.sum(x**2, dim=1, keepdim=True))
        return x / (norm + eps)

    def forward(self, a, b):
        fa = self.net(self.scaling_layer(a))
        fb = self.net(self.scaling_layer(b))
        total = 0.0
        for s in range(5):
            da = self._normalize(fa[s])
            db = self._normalize(fb[s])
            diff = (da - db) ** 2
            lin = getattr(self, f"lin{s}")
            val = lin(diff).mean(dim=(2, 3))  # spatial average
            total = total + val
        return total[:, 0]


def test_lpips_torch_parity():
    torch.manual_seed(0)
    model = TorchLPIPS().eval()
    # Non-negative lin weights, as the lpips package guarantees.
    with torch.no_grad():
        for s in range(5):
            conv = getattr(model, f"lin{s}").model[1]
            conv.weight.abs_()

    state = {k: v.numpy() for k, v in model.state_dict().items()}
    params = load_torch_lpips_weights(state)

    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)

    with torch.no_grad():
        ref = model(torch.from_numpy(a), torch.from_numpy(b)).numpy()

    out = LPIPS().apply(
        params,
        jnp.asarray(np.transpose(a, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(b, (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)
