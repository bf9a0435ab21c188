"""Per-image checkpoint scoring over a paired val split (CPU).

Reproduces the training val protocol (reference neosr/models/image.py:
792-922: per-image metric accumulation; here additionally GROUPED by the
source-image prefix in the tile filename, see tools/make_real_anchor.py
--v4) for a saved ``net_g_*.ckpt``: build the network from the anchor
TOML's [network_g] (same use_amp -> bf16 compute dtype as training val),
load the EMA params (the val path's preference), run every val_lq tile
through the same uint8-in/normalize-in-graph forward, quantize with
tensor2img, and score with the MATLAB-convention Y/crop4 metrics.

    python tools/score_ckpt.py --ckpt experiments/X/models/net_g_6000.ckpt \
        --opt options/anchors/anchor_rplk_v4_plain.toml --root /tmp/anchor_real4

Runs on CPU so it never competes with an on-chip training run.
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import cv2  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from neosr_tpu.archs import build_network  # noqa: E402
from neosr_tpu.metrics.calculate import calculate_psnr, calculate_ssim  # noqa: E402
from neosr_tpu.utils.checkpoint import load_pytree  # noqa: E402
from neosr_tpu.utils.img_util import tensor2img  # noqa: E402
from neosr_tpu.utils.options import toml_load  # noqa: E402


def load_eval_params(ckpt_path: str, prefer_ema: bool = True):
    loaded = load_pytree(ckpt_path)
    keys = ("params-ema", "params_ema", "params") if prefer_ema else ("params",)
    if isinstance(loaded, dict):
        for key in keys:
            if key in loaded:
                return loaded[key], key
    return loaded, "<root>"


def score(ckpt: str, opt_path: str, root: str, prefer_ema: bool = True,
          crop_border: int = 4, y_channel: bool = True) -> dict:
    cfg = toml_load(opt_path)
    dtype = jnp.bfloat16 if cfg.get("use_amp") else jnp.float32
    net = build_network(dict(cfg["network_g"]), cfg.get("scale", 4), dtype)
    params, key = load_eval_params(ckpt, prefer_ema)
    print(f"loaded {ckpt} [{key}] dtype={'bf16' if dtype==jnp.bfloat16 else 'fp32'}")

    @jax.jit
    def fwd(params, x):
        x = x.astype(jnp.float32) / 255.0
        return net.apply({"params": params}, x).astype(jnp.float32)

    names = sorted(os.listdir(os.path.join(root, "val_gt")))
    groups: dict[str, list[tuple[float, float]]] = defaultdict(list)
    for name in names:
        # metrics take RGB (rgb2ycbcr, same as the val pipeline's
        # tensor2img(rgb2bgr=False) path) — keep everything RGB end to end
        gt = cv2.cvtColor(cv2.imread(os.path.join(root, "val_gt", name)),
                          cv2.COLOR_BGR2RGB)
        lq = cv2.cvtColor(cv2.imread(os.path.join(root, "val_lq", name)),
                          cv2.COLOR_BGR2RGB)
        x = jnp.asarray(lq[None])  # NHWC uint8 RGB
        sr = tensor2img(np.asarray(fwd(params, x)), rgb2bgr=False)
        p = calculate_psnr(sr, gt, crop_border=crop_border,
                           test_y_channel=y_channel)
        s = calculate_ssim(sr, gt, crop_border=crop_border,
                           test_y_channel=y_channel)
        groupkey = name.rsplit("_", 1)[0] if "_" in name else "img"
        groups[groupkey].append((float(p), float(s)))
    out = {}
    allv = [v for vs in groups.values() for v in vs]
    for groupkey, vs in sorted(groups.items()):
        out[groupkey] = (float(np.mean([v[0] for v in vs])),
                         float(np.mean([v[1] for v in vs])), len(vs))
    out["OVERALL"] = (float(np.mean([v[0] for v in allv])),
                      float(np.mean([v[1] for v in allv])), len(allv))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--opt", required=True)
    ap.add_argument("--root", default="/tmp/anchor_real4")
    ap.add_argument("--raw", action="store_true",
                    help="score the raw (non-EMA) params")
    args = ap.parse_args()
    for key, (p, s, n) in score(args.ckpt, args.opt, args.root,
                                prefer_ema=not args.raw).items():
        print(f"{key:10s} {p:.4f} / {s:.4f}  ({n} tiles)")


if __name__ == "__main__":
    main()
