"""VGG19/VGG16 feature extractors (NHWC flax) for perceptual-type losses.

Counterpart of /root/reference/neosr/archs/vgg_arch.py:75-199: named conv
features (conv{stage}_{idx}, pre-ReLU taps available post-activation like
torchvision's sequential), input normalization mean 0.5 / std 0.25
(vgg_arch.py:160-174).

Pretrained ImageNet weights cannot be downloaded in this environment (zero
egress, torchvision absent).  The extractor loads weights from a
`weights_path` (npz/safetensors produced by tools/convert_vgg_weights.py
from a torchvision checkpoint); without one it falls back to random
initialization with a loud warning — numerically functional, perceptually
meaningless until weights are supplied.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.utils.logger import get_root_logger

# conv layout per VGG variant: channels per stage, convs per stage
VGG_CONFIGS = {
    "vgg19": ((64, 2), (128, 2), (256, 4), (512, 4), (512, 4)),
    "vgg16": ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3)),
}


class VGGFeatures(nn.Module):
    """Runs the VGG trunk, returning a dict of requested conv features."""

    layer_names: Sequence[str]
    vgg_type: str = "vgg19"
    use_input_norm: bool = True
    range_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> dict[str, jnp.ndarray]:
        if self.range_norm:
            x = (x + 1) / 2
        if self.use_input_norm:
            x = (x - 0.5) / 0.25

        wanted = set(self.layer_names)
        max_stage = max(int(name[4]) for name in wanted)
        feats: dict[str, jnp.ndarray] = {}
        for stage, (ch, n_convs) in enumerate(VGG_CONFIGS[self.vgg_type], start=1):
            if stage > max_stage:
                break
            for i in range(1, n_convs + 1):
                name = f"conv{stage}_{i}"
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32, name=name)(x)
                if name in wanted:
                    feats[name] = x.astype(jnp.float32)
                x = jax.nn.relu(x)
            if stage < max_stage:
                # maxpool 2x2 stride 2
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
        return feats


def build_feature_extractor(
    layer_names: Sequence[str],
    vgg_type: str = "vgg19",
    use_input_norm: bool = True,
    range_norm: bool = False,
    weights_path: str | None = None,
):
    """Returns (pure_fn(x) -> {name: feat}, params). Params are constants
    (closed over / stop-gradient at the call site)."""
    logger = get_root_logger()
    module = VGGFeatures(
        tuple(layer_names), vgg_type, use_input_norm, range_norm
    )
    params = module.init(jax.random.key(7), jnp.zeros((1, 64, 64, 3)))["params"]

    if weights_path:
        loaded = dict(np.load(weights_path))
        grafted = {}
        for layer, p in params.items():
            kernel = loaded.get(f"{layer}.kernel")
            bias = loaded.get(f"{layer}.bias")
            if kernel is None:
                msg = f"weights file missing {layer}.kernel"
                raise KeyError(msg)
            grafted[layer] = {
                "kernel": jnp.asarray(kernel).reshape(p["kernel"].shape),
                "bias": jnp.asarray(bias).reshape(p["bias"].shape),
            }
        params = grafted
        logger.info(f"Loaded {vgg_type} feature weights from {weights_path}")
    else:
        logger.warning(
            f"No pretrained {vgg_type} weights available (zero-egress "
            "environment). Perceptual features use RANDOM weights — supply "
            "`weights_path` (see tools/convert_vgg_weights.py) for real use."
        )

    params = jax.lax.stop_gradient(params)

    def extract(x: jnp.ndarray) -> dict[str, jnp.ndarray]:
        return module.apply({"params": params}, x)

    return extract, params
