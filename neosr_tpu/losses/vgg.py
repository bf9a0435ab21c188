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


def verify_sha256(path: str, expected: str | None) -> None:
    """Optional integrity gate for pretrained-weight files: always logs the
    file's sha256; errors when an expected digest is configured and differs
    (weights are the one externally-supplied artifact — a silent swap would
    corrupt every perceptual-trained model)."""
    import hashlib
    from pathlib import Path

    digest = hashlib.sha256(Path(path).read_bytes()).hexdigest()
    get_root_logger().info(f"weights sha256 {digest}  {path}")
    if expected and digest.lower() != expected.lower():
        msg = (
            f"weights checksum mismatch for {path}: got {digest}, "
            f"expected {expected}"
        )
        raise ValueError(msg)


def find_torchvision_vgg(vgg_type: str) -> str | None:
    """Auto-detect a locally cached torchvision VGG .pth (zero-egress envs
    can pre-seed ~/.cache/torch/hub/checkpoints); returns a path or None."""
    import glob
    import os

    hubs = [
        os.path.join(os.environ.get("TORCH_HOME", ""), "hub", "checkpoints"),
        os.path.expanduser("~/.cache/torch/hub/checkpoints"),
    ]
    for hub in hubs:
        if not hub or not os.path.isdir(hub):
            continue
        hits = sorted(glob.glob(os.path.join(hub, f"{vgg_type}-*.pth")))
        if hits:
            return hits[0]
    return None


def _torchvision_pth_to_npz_dict(vgg_type: str, path: str) -> dict:
    """Convert a torchvision VGG .pth state_dict to our npz key layout
    (same mapping as tools/convert_vgg_weights.py, in-process)."""
    import torch

    configs = {
        "vgg19": ((64, 2), (128, 2), (256, 4), (512, 4), (512, 4)),
        "vgg16": ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3)),
    }
    sd = torch.load(path, map_location="cpu", weights_only=True)
    out: dict[str, np.ndarray] = {}
    idx = 0
    for stage, (_ch, n_convs) in enumerate(configs[vgg_type], start=1):
        for i in range(1, n_convs + 1):
            w = sd[f"features.{idx}.weight"].numpy()
            out[f"conv{stage}_{i}.kernel"] = w.transpose(2, 3, 1, 0)
            out[f"conv{stage}_{i}.bias"] = sd[f"features.{idx}.bias"].numpy()
            idx += 2
        idx += 1
    return out


def build_feature_extractor(
    layer_names: Sequence[str],
    vgg_type: str = "vgg19",
    use_input_norm: bool = True,
    range_norm: bool = False,
    weights_path: str | None = None,
    weights_sha256: str | None = None,
):
    """Returns (pure_fn(x) -> {name: feat}, params). Params are constants
    (closed over / stop-gradient at the call site)."""
    logger = get_root_logger()
    module = VGGFeatures(
        tuple(layer_names), vgg_type, use_input_norm, range_norm
    )
    params = module.init(jax.random.key(7), jnp.zeros((1, 64, 64, 3)))["params"]

    if not weights_path:
        cached = find_torchvision_vgg(vgg_type)
        if cached:
            logger.info(f"Using torchvision cache weights: {cached}")
            weights_path = cached

    if weights_path:
        verify_sha256(weights_path, weights_sha256)
        if str(weights_path).endswith((".pth", ".pt")):
            loaded = _torchvision_pth_to_npz_dict(vgg_type, weights_path)
        else:
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
            "environment). Perceptual features use RANDOM weights — run "
            f"`python tools/convert_vgg_weights.py {vgg_type} "
            f"<torchvision .pth> {vgg_type}_features.npz` offline and set "
            "`weights_path` in the loss config (or pre-seed "
            "~/.cache/torch/hub/checkpoints for auto-detection)."
        )

    params = jax.lax.stop_gradient(params)

    def extract(x: jnp.ndarray) -> dict[str, jnp.ndarray]:
        return module.apply({"params": params}, x)

    return extract, params
