"""LPIPS perceptual loss: VGG16 feature distance with learned linear weights.

TPU-native re-implementation of the `lpips` package's VGG variant used by
the reference for both training loss (src/loss/loss_lpips.py:57-84) and the
evaluation metric (src/evaluation/metrics.py:22-33).

Architecture: images in [-1, 1] are shifted/scaled by the LPIPS
normalization constants, run through VGG16 conv features; activations after
relu1_2, relu2_2, relu3_3, relu4_3, relu5_3 are channel-unit-normalized,
squared-differenced, reduced by non-negative 1x1 "lin" weights and averaged
spatially, then summed over the five stages.

Weights: this environment has no network access and no torchvision/lpips
weight caches, so `init_lpips_params` produces a deterministic random VGG
(still a useful multi-scale perceptual prior, but NOT numerically the
canonical LPIPS). `load_torch_lpips_weights` converts a torch LPIPS state
dict (from the `lpips` pip package) into this module's parameter tree when
such a checkpoint is provided, restoring exact parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG16 conv plan: (channels, num_convs) per stage.
VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# lpips.ScalingLayer constants (operate on [-1, 1] inputs).
LPIPS_SHIFT = (-0.030, -0.088, -0.188)
LPIPS_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    """VGG16 through conv5_3, returning the five LPIPS feature stages."""

    @nn.compact
    def __call__(self, x):
        feats = []
        for s, (ch, n_conv) in enumerate(VGG_STAGES):
            for i in range(n_conv):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{s+1}_{i+1}")(x)
                x = nn.relu(x)
            feats.append(x)
            if s < len(VGG_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    @nn.compact
    def __call__(self, a, b):
        """a, b: (batch, h, w, 3) in [-1, 1]. Returns (batch,) distances."""
        shift = jnp.asarray(LPIPS_SHIFT)
        scale = jnp.asarray(LPIPS_SCALE)
        net = VGG16Features(name="vgg")
        fa = net((a - shift) / scale)
        fb = net((b - shift) / scale)

        total = 0.0
        for s, (xa, xb) in enumerate(zip(fa, fb)):
            # Canonical lpips normalize_tensor: x / (||x||_c + eps), with the
            # eps OUTSIDE the sqrt (lpips/__init__.py normalize_tensor).
            na = xa / (jnp.sqrt(jnp.sum(xa**2, axis=-1, keepdims=True)) + 1e-10)
            nb = xb / (jnp.sqrt(jnp.sum(xb**2, axis=-1, keepdims=True)) + 1e-10)
            diff = (na - nb) ** 2
            lin = self.param(
                f"lin{s}", nn.initializers.uniform(0.1), (diff.shape[-1],)
            )
            contrib = jnp.einsum("bhwc,c->bhw", diff, jax.nn.relu(lin))
            total = total + jnp.mean(contrib, axis=(1, 2))
        return total


def init_lpips_params(key=None):
    """Deterministic init (NOT canonical LPIPS weights — see module doc)."""
    key = jax.random.PRNGKey(0) if key is None else key
    model = LPIPS()
    dummy = jnp.zeros((1, 64, 64, 3))
    return model.init(key, dummy, dummy)


def load_torch_lpips_weights(torch_state: dict) -> dict:
    """Convert an `lpips.LPIPS(net='vgg')` torch state_dict to flax params.

    torch keys: net.slice{1..5}.{idx}.weight/bias (conv, OIHW) and
    lin{0..4}.model.1.weight (1x1 conv, (1, C, 1, 1)).
    """
    # VGG16 torchvision feature indices of convs per slice.
    slice_convs = {
        1: [0, 2], 2: [5, 7], 3: [10, 12, 14], 4: [17, 19, 21], 5: [24, 26, 28],
    }
    params: dict = {"vgg": {}}
    for s, idxs in slice_convs.items():
        for i, idx in enumerate(idxs):
            w = None
            for key_fmt in (f"net.slice{s}.{idx}.weight", f"net.slice{s}.{idx}.weight"):
                if key_fmt in torch_state:
                    w = torch_state[key_fmt]
                    b = torch_state[key_fmt.replace("weight", "bias")]
                    break
            if w is None:
                raise KeyError(f"missing conv weight for slice{s} idx {idx}")
            w = np.asarray(w)
            params["vgg"][f"conv{s}_{i+1}"] = {
                "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                "bias": jnp.asarray(np.asarray(b)),
            }
    for s in range(5):
        lw = np.asarray(torch_state[f"lin{s}.model.1.weight"])[0, :, 0, 0]
        params[f"lin{s}"] = jnp.asarray(lw)
    return {"params": params}


@jax.checkpoint
def lpips_distances(lpips_params, prediction, target):
    """(b, h, w, 3) images in [0, 1] -> (b,) LPIPS distances.

    Rematerialized: the VGG activations are ~3 GB at the flagship b=16
    256^2 batch; recomputing the (cheap vs ViT-L) VGG forward in the
    backward pass trades that for ~2x VGG FLOPs.
    """
    model = LPIPS()
    return model.apply(lpips_params, prediction * 2 - 1, target * 2 - 1)


def lpips_loss(lpips_params, prediction, target, weight: float = 1.0):
    """prediction/target (b, h, w, 3) in [0, 1] -> scalar weighted LPIPS."""
    return weight * jnp.mean(lpips_distances(lpips_params, prediction, target))


def get_lpips_params(use_lpips: bool, weights_path=None):
    """Centralized LPIPS param loading.

    Returns (params | None, calibrated: bool).  `calibrated` is False when
    no converted-VGG weights path is configured: the net then runs with
    deterministic random features, which is a valid *training* perceptual
    prior but NOT comparable to published LPIPS numbers — downstream
    metric dumps must label the metric `lpips_uncalibrated` in that case
    (reference metric: src/evaluation/metrics.py:22-33 with canonical
    torchvision VGG16 weights).
    """
    if not use_lpips:
        return None, True
    if weights_path:
        import torch

        sd = torch.load(weights_path, map_location="cpu")
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
        return load_torch_lpips_weights(sd), True
    print(
        "WARNING: no LPIPS weights path; using deterministic random "
        "VGG features (set loss.lpips_weights_path for canonical LPIPS). "
        "Reported metrics will be labeled 'lpips_uncalibrated'."
    )
    return init_lpips_params(), False
