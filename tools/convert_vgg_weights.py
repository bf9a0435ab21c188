"""Convert torchvision VGG16/VGG19 checkpoints to the npz layout used by
neosr_tpu.losses.vgg (NHWC flax kernels, keys conv{stage}_{i}.kernel/.bias).

Usage (on a machine with torchvision + downloaded weights):
    python tools/convert_vgg_weights.py vgg19 /path/vgg19.pth vgg19_features.npz
The .pth can be a torchvision state_dict (features.N.weight layout).
"""

from __future__ import annotations

import sys

import numpy as np

CONFIGS = {
    "vgg19": ((64, 2), (128, 2), (256, 4), (512, 4), (512, 4)),
    "vgg16": ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3)),
}


def main(vgg_type: str, src: str, dst: str) -> None:
    import torch

    sd = torch.load(src, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    # torchvision features.* indexing: conv layers at sequential positions
    out: dict[str, np.ndarray] = {}
    idx = 0
    for stage, (_ch, n_convs) in enumerate(CONFIGS[vgg_type], start=1):
        for i in range(1, n_convs + 1):
            w = sd[f"features.{idx}.weight"].numpy()  # (out, in, kh, kw)
            b = sd[f"features.{idx}.bias"].numpy()
            out[f"conv{stage}_{i}.kernel"] = w.transpose(2, 3, 1, 0)  # HWIO
            out[f"conv{stage}_{i}.bias"] = b
            idx += 2  # conv + relu
        idx += 1  # maxpool
    np.savez(dst, **out)
    print(f"wrote {dst} ({len(out)} arrays)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
