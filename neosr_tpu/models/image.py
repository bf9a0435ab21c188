"""The SISR training strategy — functional, jitted, mesh-sharded.

Capability counterpart of /root/reference/neosr/models/image.py:27-984, but
the training step is a single pure function compiled once by XLA:

    state' , logs = train_step(state, lq, gt)

containing G forward + all configured losses + G update, the discriminator
real/fake passes + D update (GAN mode), EMA update and the NaN guard.  The
reference's GradScaler/autocast, requires_grad toggling, and
`reduce_loss_dict` disappear: bf16 is a module dtype, D-freezing is
`stop_gradient` / separate grad functions, and loss logging reads device
scalars lazily.  Data parallelism comes from feeding mesh-sharded batches;
XLA inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

import functools
import os
from pathlib import Path
from typing import Any

import numpy as np

import jax
import jax.flatten_util
import jax.numpy as jnp
import optax
from flax import struct

from neosr_tpu.archs import build_network
from neosr_tpu.losses import build_loss
from neosr_tpu.metrics import calculate_metric
from neosr_tpu.models.base import base
from neosr_tpu.optimizers import build_optimizer, current_lr, is_schedule_free, sf_eval_params
from neosr_tpu.parallel.mesh import replicate, shard_batch
from neosr_tpu.utils.checkpoint import export_safetensors, load_pytree, save_pytree
from neosr_tpu.utils.img_util import imwrite, tensor2img
from neosr_tpu.utils.logger import get_root_logger
from neosr_tpu.utils.misc import tc
from neosr_tpu.utils.registry import MODEL_REGISTRY

# loss config keys consumed from [train] (reference image.py:153-221)
_G_LOSS_KEYS = (
    "pixel_opt",
    "mssim_opt",
    "consistency_opt",
    "ldl_opt",
    "ff_opt",
    "gw_opt",
)
_PERCEPTUAL_KEYS = ("perceptual_opt", "dists_opt")


class TrainState(struct.PyTreeNode):
    step: jax.Array
    rng: jax.Array
    params_g: Any
    opt_g: Any
    ema_g: Any | None
    params_d: Any | None
    opt_d: Any | None
    nan_count: jax.Array
    sam_m: Any | None = None       # F-SAM momentum-filtered gradient EMA
    sam_t: jax.Array | None = None  # F-SAM steps taken (0 = uninitialized)
    # BatchNorm running statistics (flax "batch_stats" collections; empty
    # dicts for the BN-free majority of archs)
    bstats_g: Any = None
    bstats_d: Any = None


def _tree_where(pred: jax.Array, a: Any, b: Any) -> Any:
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


@MODEL_REGISTRY.register()
class image(base):
    """Single-image SR model (paired data)."""

    def __init__(self, opt: dict[str, Any]) -> None:
        super().__init__(opt)
        logger = get_root_logger()
        self.scale = opt["scale"]
        self.use_amp = bool(opt.get("use_amp", False) or opt.get("bfloat16", False))
        self.dtype = jnp.bfloat16 if self.use_amp else jnp.float32

        self.net_g = build_network(opt["network_g"], self.scale, self.dtype)
        logger.info(f"Network [net_g={opt['network_g']['type']}] created.")

        train_opt = opt.get("train", {})
        self.ema_decay = train_opt.get("ema", -1) if self.is_train else -1
        self.accumulate = 1
        self.flat_apply_g = self.flat_apply_d = False
        self.net_d = None
        self.cri_gan = None

        # --- init params --------------------------------------------------
        seed = opt.get("manual_seed", 0)
        self.rng = jax.random.key(seed)
        init_rng, self.rng = jax.random.split(self.rng)
        if self.is_train:
            patch = opt["datasets"]["train"].get("patch_size", 48)
        else:
            patch = 64
        in_ch = 1 if opt.get("color") == "y" else 3
        sample = jnp.zeros((1, patch, patch, in_ch), jnp.float32)
        variables = jax.jit(self.net_g.init)(init_rng, sample)
        self.params_g = variables["params"]
        # BN archs (dat/eimn/dctlsa/ea2fpn) carry running statistics
        self.bstats_g = dict(variables.get("batch_stats", {}))
        n_params = sum(int(x.size) for x in jax.tree.leaves(self.params_g))
        logger.info(f"net_g parameters: {n_params:,d}")
        if opt.get("path", {}).get("print_network", False):
            # reference base.py print_network: full module description
            logger.info(f"Network [net_g]:\n{self.net_g}")

        # --- pretrained weights -------------------------------------------
        load_path = opt.get("path", {}).get("pretrain_network_g")
        if load_path:
            self.params_g = self._load_network(
                self.params_g, load_path,
                opt["path"].get("param_key_g", "params"),
                opt["path"].get("strict_load_g", True),
            )

        if self.is_train:
            self._init_training_settings(train_opt)
        else:
            self.state = None
            self.eval_params = self.params_g

        # jitted eval forward (shared by test/validation); uint8 inputs
        # normalize in-graph so val batches also transfer 4x cheaper.
        # BN archs get their running statistics alongside the params
        # (torch .eval() semantics — reference dat_arch.py:386-398).
        def _eval_apply(variables, x, ph=0, pw=0):
            if jnp.issubdtype(x.dtype, jnp.integer):
                x = x.astype(jnp.float32) / 255.0
            if ph or pw:
                # reflect-pad IN-GRAPH: no host round-trip per image
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                            mode="reflect")
            return self.net_g.apply(variables, x).astype(jnp.float32)

        self._apply_fn = jax.jit(_eval_apply, static_argnums=(2, 3))

        # in-graph tiled inference (see _tiled_forward_graph): the whole
        # tile grid runs as ONE jitted scan — a single dispatch per image
        # instead of a host gather/scatter round-trip per tile chunk.
        def _tiled_apply(variables, x, tile, overlap, scale):
            if jnp.issubdtype(x.dtype, jnp.integer):
                x = x.astype(jnp.float32) / 255.0
            n, h, w, c = x.shape
            step = tile - 2 * overlap
            gh = -(-h // step)
            gw = -(-w // step)
            # edge-replicate halo (traced in-graph — no eager device op over
            # the tunnel).  Interior tiles reproduce the whole-image forward
            # EXACTLY (overlap >= receptive-field radius); at the image
            # border any tiling deviates within one receptive field of the
            # edge — deep-net zero-input features are nonzero (bias + act),
            # so no input-space halo can equal the whole forward's SAME
            # feature padding there, and edge-replicate degrades gracefully.
            x = jnp.pad(
                x,
                ((0, 0), (overlap, gh * step - h + overlap),
                 (overlap, gw * step - w + overlap), (0, 0)),
                mode="edge",
            )
            s = scale
            canvas = jnp.zeros((n, gh * step * s, gw * step * s, c), jnp.float32)
            idx = jnp.arange(gh * gw)
            ys = (idx // gw) * step
            xs = (idx % gw) * step
            lo, hi = overlap * s, (overlap + step) * s

            def body(canvas, yx):
                y0, x0 = yx
                t = jax.lax.dynamic_slice(x, (0, y0, x0, 0), (n, tile, tile, c))
                sr = self.net_g.apply(variables, t).astype(jnp.float32)
                canvas = jax.lax.dynamic_update_slice(
                    canvas, sr[:, lo:hi, lo:hi, :], (0, y0 * s, x0 * s, 0)
                )
                return canvas, None

            canvas, _ = jax.lax.scan(body, canvas, (ys, xs))
            return canvas[:, : h * s, : w * s, :]

        self._tiled_graph_fn = jax.jit(_tiled_apply, static_argnums=(2, 3, 4))

    # ------------------------------------------------------------ training
    def _init_training_settings(self, train_opt: dict[str, Any]) -> None:
        logger = get_root_logger()
        opt = self.opt

        # ---- losses ------------------------------------------------------
        # config wall: an unrecognized *_opt key under [train] is a user
        # error (e.g. a typo'd loss name) and must fail loudly, like the
        # reference's fixed if-chain does by simply never training that
        # loss (reference image.py:153-221 — here we go further and error)
        known = set(_G_LOSS_KEYS) | set(_PERCEPTUAL_KEYS) | {"gan_opt"}
        unknown = [k for k in train_opt if k.endswith("_opt") and k not in known]
        if unknown:
            msg = (
                f"{tc.red}Unknown loss option(s) in [train]: "
                f"{', '.join(sorted(unknown))}. Supported: "
                f"{', '.join(sorted(known))}.{tc.end}"
            )
            raise ValueError(msg)
        self.g_losses: dict[str, Any] = {}
        for key in _G_LOSS_KEYS + _PERCEPTUAL_KEYS:
            cfg = train_opt.get(key)
            if cfg:
                name = key.replace("_opt", "")
                if key in _PERCEPTUAL_KEYS:
                    cfg = {**cfg, "scale": cfg.get("scale", self.scale)}
                self.g_losses[f"l_g_{name}"] = build_loss(cfg)
        if train_opt.get("gan_opt"):
            self.cri_gan = build_loss(train_opt["gan_opt"])

        if not self.g_losses and self.cri_gan is None:
            msg = f"{tc.red}No loss configured. Please set at least one loss in [train].{tc.end}"
            raise ValueError(msg)
        if train_opt.get("gan_opt") and not opt.get("network_d"):
            msg = f"{tc.red}gan_opt requires [network_d].{tc.end}"
            raise ValueError(msg)
        if opt.get("network_d") and not train_opt.get("gan_opt"):
            msg = f"{tc.red}[network_d] set but no gan_opt configured.{tc.end}"
            raise ValueError(msg)
        if train_opt.get("optim_d") and not opt.get("network_d"):
            msg = f"{tc.red}[train.optim_d] set but no [network_d] configured.{tc.end}"
            raise ValueError(msg)
        if (
            opt.get("network_d", {}).get("type") == "ea2fpn"
            and opt.get("datasets", {}).get("train", {}).get("patch_size", 48) == 48
            and self.scale == 1
        ):
            # reference image.py:280-294: ea2fpn's FPN strides collapse at
            # this input size; same restriction here (checked before net_d
            # init, which would otherwise fail on the degenerate shapes)
            msg = (
                f"{tc.red}Discriminator ea2fpn does not work with patch_size "
                f"48 at 1x scale; change patch_size.{tc.end}"
            )
            raise ValueError(msg)

        # ---- discriminator ----------------------------------------------
        self.params_d = None
        self.bstats_d = {}
        if opt.get("network_d") and self.cri_gan is not None:
            net_d_opt = {
                k: v for k, v in opt["network_d"].items()
                if k not in ("trunk_weights_path", "trunk_weights_sha256")
            }
            self.net_d = build_network(net_d_opt, None, self.dtype)
            logger.info(f"Network [net_d={opt['network_d']['type']}] created.")
            init_rng, self.rng = jax.random.split(self.rng)
            patch = opt["datasets"]["train"].get("patch_size", 48)
            hr = patch * self.scale
            in_ch = 1 if opt.get("color") == "y" else 3
            variables_d = self.net_d.init(
                init_rng, jnp.zeros((1, hr, hr, in_ch), jnp.float32)
            )
            self.params_d = variables_d["params"]
            self.bstats_d = dict(variables_d.get("batch_stats", {}))
            trunk_path = opt["network_d"].get("trunk_weights_path")
            if trunk_path and opt["network_d"].get("type") == "ea2fpn":
                self._load_ea2fpn_trunk(
                    trunk_path, opt["network_d"].get("trunk_weights_sha256"))
            load_path_d = opt.get("path", {}).get("pretrain_network_d")
            if load_path_d:
                self.params_d = self._load_network(
                    self.params_d, load_path_d,
                    opt["path"].get("param_key_d", "params"),
                    opt["path"].get("strict_load_d", True),
                    net="network_d",
                )

        # ---- ECO / SAM / color matching ---------------------------------
        self.eco = train_opt.get("eco", False)
        self.eco_schedule = train_opt.get("eco_schedule", "sigmoid")
        self.eco_iters = train_opt.get("eco_iters", 80000)
        self.eco_init = train_opt.get("eco_init", 15000)
        self.has_pretrain_g = bool(opt.get("path", {}).get("pretrain_network_g"))
        self.match_lq_colors = train_opt.get("match_lq_colors", False)
        self.sam = train_opt.get("sam")
        self.sam_init = train_opt.get("sam_init", -1)
        self.wavelet_guided = train_opt.get("wavelet_guided", False)
        self.wavelet_init = train_opt.get("wavelet_init", 80000)
        if self.sam is not None and self.sam not in ("fsam",):
            msg = f"{tc.red}Unknown sam type {self.sam} (supported: fsam).{tc.end}"
            raise ValueError(msg)
        # config error wall, matching reference image.py:241-294 semantics
        if self.sam is not None and self.use_amp:
            logger.warning(
                f"{tc.red}SAM with reduced-precision compute can be unstable; "
                f"disable use_amp/bfloat16 if results degrade.{tc.end}"
            )
        if self.wavelet_guided and self.cri_gan is None:
            msg = f"{tc.red}wavelet_guided requires GAN (gan_opt + network_d).{tc.end}"
            raise ValueError(msg)

        # ---- optimizers --------------------------------------------------
        total_iter = opt.get("logger", {}).get("total_iter", 1_000_000)
        warmup = train_opt.get("warmup_iter", -1)
        self.accumulate = opt["datasets"]["train"].get("accumulate", 1) or 1
        if self.sam and self.accumulate > 1:
            msg = f"{tc.red}SAM is incompatible with gradient accumulation.{tc.end}"
            raise ValueError(msg)
        self.grad_clip = train_opt.get("grad_clip", False)

        # NEOSR_PARAM_STORAGE=bf16: perf PROBE only — hold params (and
        # therefore optimizer state + EMA, which init from them) in bf16
        # storage to measure the weight-traffic ceiling of the train step.
        # flax modules already CAST params to the bf16 compute dtype inside
        # every apply under use_amp, so this probe isolates the storage /
        # optimizer / EMA HBM traffic alone.  Quality-unsafe (optimizer
        # moments lose mantissa) — bench probe, never a production config.
        if os.environ.get("NEOSR_PARAM_STORAGE") == "bf16":
            def _cast_bf16(tree):
                return jax.tree.map(
                    lambda p: p.astype(jnp.bfloat16)
                    if p.dtype == jnp.float32 else p, tree)
            self.params_g = _cast_bf16(self.params_g)
            if self.params_d is not None:
                self.params_d = _cast_bf16(self.params_d)

        self.optim_g, self.lr_g, self.flat_apply_g = self._make_optim(
            train_opt["optim_g"], train_opt.get("scheduler"), total_iter, warmup
        )
        opt_g_state = self.optim_g.init(self.params_g)
        self.sf_g = is_schedule_free(opt_g_state)

        self.optim_d, self.lr_d = None, None
        self.flat_apply_d = False
        opt_d_state = None
        if self.params_d is not None:
            if "optim_d" not in train_opt:
                msg = f"{tc.red}[network_d] configured but [train.optim_d] missing.{tc.end}"
                raise ValueError(msg)
            self.optim_d, self.lr_d, self.flat_apply_d = self._make_optim(
                train_opt["optim_d"], train_opt.get("scheduler"), total_iter, warmup
            )
            opt_d_state = self.optim_d.init(self.params_d)
            self.sf_d = is_schedule_free(opt_d_state)

        ema_g = jax.tree.map(jnp.copy, self.params_g) if self.ema_decay > 0 else None
        sam_m = jax.tree.map(jnp.zeros_like, self.params_g) if self.sam else None

        state = TrainState(
            step=jnp.zeros([], jnp.int32),
            rng=self.rng,
            params_g=self.params_g,
            opt_g=opt_g_state,
            ema_g=ema_g,
            params_d=self.params_d,
            opt_d=opt_d_state,
            nan_count=jnp.zeros([], jnp.int32),
            sam_m=sam_m,
            sam_t=jnp.zeros([], jnp.int32) if self.sam else None,
            bstats_g=self.bstats_g,
            bstats_d=self.bstats_d,
        )
        self.state = replicate(state, self.mesh)
        # raw (un-jitted) step is kept so subclasses can fuse extra device
        # work (e.g. OTF degradations) into a single XLA program
        self._train_step_raw = self._make_train_step()
        self._train_step = jax.jit(self._train_step_raw, donate_argnums=0)

    def _make_optim(self, optim_cfg, sched_cfg, total_iter, warmup):
        # flat-apply: run the optimizer update, the apply-updates add, the
        # NaN-guard select and the EMA blend on ONE raveled (N,) vector per
        # net instead of per-leaf tree_maps (~700 leaves x 3 elementwise
        # kernels/step for RRDBNet-23).  Elementwise math is identical per
        # element, so trajectories are bit-equal to the tree path (the only
        # reassociation is clip_by_global_norm's sum order); optimizer
        # checkpoint layout is unchanged (optax.flatten stores the same
        # flat state).  NEOSR_FUSED_APPLY=0 is the measurement kill-switch.
        flat = (
            bool(optim_cfg.get("fused", True))
            and self.accumulate == 1
            and os.environ.get("NEOSR_FUSED_APPLY", "1") != "0"
        )
        optim, lr = build_optimizer(
            optim_cfg, sched_cfg, total_iter, warmup, wrap_fused=not flat
        )
        chain = []
        if self.grad_clip:
            chain.append(optax.clip_by_global_norm(1.0))
        chain.append(optim)
        optim = optax.chain(*chain) if len(chain) > 1 else optim
        if self.accumulate > 1:
            optim = optax.MultiSteps(optim, every_k_schedule=self.accumulate)
        if flat:
            inner = optim

            def _init(params):
                leaves = jax.tree.leaves(params)
                if len(leaves) == 1 and jnp.ndim(leaves[0]) == 1:
                    return inner.init(leaves[0])
                return inner.init(
                    jnp.concatenate([jnp.ravel(p) for p in leaves])
                )

            optim = optax.GradientTransformation(_init, inner.update)
        return optim, lr, flat

    def _make_train_step(self):
        from neosr_tpu.ops.resize import resize_antialias

        net_g, net_d = self.net_g, self.net_d
        g_losses = dict(self.g_losses)
        cri_gan = self.cri_gan
        optim_g, optim_d = self.optim_g, self.optim_d
        flat_apply_g, flat_apply_d = self.flat_apply_g, self.flat_apply_d
        ema_decay = self.ema_decay
        scale = self.scale
        eco = self.eco
        eco_schedule, eco_iters, eco_init = (
            self.eco_schedule, self.eco_iters, self.eco_init,
        )
        has_pretrain = self.has_pretrain_g
        match_lq = self.match_lq_colors
        sam = self.sam
        sam_init = max(self.sam_init, 0)
        sam_rho, sam_sigma, sam_lmbda, sam_adaptive = 0.5, 1.0, 0.9, True

        has_bs_g = bool(jax.tree.leaves(self.bstats_g))
        has_bs_d = bool(jax.tree.leaves(self.bstats_d))

        def apply_g(params_g, bstats_g, x, rng, update_stats=False):
            """Train-mode G forward; returns (out, new_batch_stats).
            BN archs normalize by batch statistics here (torch train mode)
            and fold the running-stat update into the step's state."""
            if has_bs_g:
                out, mut = net_g.apply(
                    {"params": params_g, "batch_stats": bstats_g}, x,
                    deterministic=False, rngs={"dropout": rng},
                    mutable=["batch_stats"],
                )
                return (
                    out.astype(jnp.float32),
                    mut["batch_stats"] if update_stats else bstats_g,
                )
            return (
                net_g.apply(
                    {"params": params_g}, x, deterministic=False,
                    rngs={"dropout": rng},
                ).astype(jnp.float32),
                bstats_g,
            )

        def apply_d(params_d, bstats_d, x, update_stats=False):
            if has_bs_d:
                out, mut = net_d.apply(
                    {"params": params_d, "batch_stats": bstats_d}, x,
                    mutable=["batch_stats"],
                )
                return out, mut["batch_stats"] if update_stats else bstats_d
            return net_d.apply({"params": params_d}, x), bstats_d

        def g_loss_fn(params_g, params_d, lq, gt, rng, step, bstats_g, bstats_d):
            # --- ECO centroid inputs (reference image.py:393-425, 441-448)
            if eco:
                sf = step.astype(jnp.float32)
                if eco_schedule == "sigmoid":
                    a = 1.0 / (1.0 + jnp.exp(-10.0 * (sf / eco_iters - 0.25)))
                else:
                    a = jnp.minimum(sf / eco_iters, 1.0)
                # centroid forward: batch-stat normalization, but the
                # running-stat update comes from the main forward only
                out_ng = jax.lax.stop_gradient(
                    apply_g(params_g, bstats_g, lq, rng)[0]
                )
                warm = jnp.asarray((not has_pretrain), jnp.bool_) & (step < eco_init)
                use = (~warm) & (step <= eco_iters)
                gt_eff = jnp.where(use, (1 - a) * out_ng + a * gt, gt)
                lq_sc = jnp.clip(
                    resize_antialias(out_ng, lq.shape[1], lq.shape[2], "bicubic"),
                    0, 1,
                )
                lq_eff = jnp.where(use, (1 - a) * lq_sc + a * lq, lq)
            else:
                lq_eff, gt_eff = lq, gt

            out, new_bs_g = apply_g(
                params_g, bstats_g, lq_eff, rng, update_stats=True
            )
            losses = {}
            total = jnp.zeros([], jnp.float32)
            if match_lq:
                lq_interp = jnp.clip(
                    resize_antialias(lq, gt.shape[1], gt.shape[2], "bicubic"),
                    1 / 255, 1,
                )
            for name, fn in g_losses.items():
                if match_lq and name == "l_g_consistency":
                    val = fn(out, lq_interp).astype(jnp.float32)
                else:
                    val = fn(out, gt_eff).astype(jnp.float32)
                losses[name] = val
                total = total + val
            if net_d is not None and cri_gan is not None:
                # G-step D forward: batch-stat mode but no running update
                # (the D step owns the stat cadence)
                fake_pred, _ = apply_d(params_d, bstats_d, out)
                l_g_gan = cri_gan(fake_pred, True, is_disc=False).astype(jnp.float32)
                losses["l_g_gan"] = l_g_gan
                total = total + l_g_gan
            losses["l_g_total"] = total
            return total, (losses, out, new_bs_g)

        # batch augmentations on the paired path (reference image.py:380-391
        # applies them in feed_data; here they fuse into the jitted step).
        # The otf model augments inside its fused degrade+train program
        # (reference otf.py:271-278 ordering), so only model_type "image"
        # augments here.
        paired_aug = None
        if self.is_train and self.opt.get("model_type") == "image":
            train_ds = self.opt.get("datasets", {}).get("train", {})
            if train_ds.get("augmentation") is not None:
                from neosr_tpu.data.augmentations import make_augment_fn

                if train_ds.get("patch_size", 48) % 4 != 0:
                    msg = (
                        f"{tc.red}patch_size must be a multiple of 4 when "
                        f"using augmentations.{tc.end}"
                    )
                    raise ValueError(msg)
                paired_aug = make_augment_fn(
                    self.scale, train_ds["augmentation"], train_ds.get("aug_prob")
                )

        wavelet = self.wavelet_guided
        wavelet_init = self.wavelet_init
        # Batching real+fake into ONE D apply measured SLOWER on the fused
        # OTF graph (116.9 -> 103.7 p/s on v5e: the concat materializes a
        # 2x-batch activation set and defeats XLA's CSE of the g-step's
        # fake forward), so separate applies are the default.  ea2fpn
        # additionally REQUIRES separate forwards (per-call batch stats).
        batch_d = bool(self.opt.get("train", {}).get("batch_d_apply", False))
        batch_d = batch_d and self.opt.get("network_d", {}).get("type") != "ea2fpn"
        # sn_update_once: run the spectral-norm power iteration only in the
        # D-step's REAL apply and keep the stored u/v for the fake apply.
        # The fake forward then has IDENTICAL HLO to the G-step's fake
        # forward (same input, same params, same sigma), so XLA CSE folds
        # the two into one D forward — one of three per step disappears.
        # Estimator cadence drops 2 -> 1 power iterations/step (torch runs
        # 3; the per-step estimate converges regardless).  SN-only
        # discriminators only: BN nets (ea2fpn) need per-apply stat updates.
        sn_once = bool(self.opt.get("train", {}).get("sn_update_once", False))
        if os.environ.get("NEOSR_SN_UPDATE") == "once":
            sn_once = True
        sn_once = sn_once and self.opt.get("network_d", {}).get("type") != "ea2fpn"

        def d_loss_fn(params_d, out, gt, step, bstats_d):
            out = jax.lax.stop_gradient(out)
            if wavelet:
                # D sees high-frequency wavelet bands once past wavelet_init
                # (reference image.py:556-574)
                from neosr_tpu.losses.wavelet_guided import wavelet_guided as wg

                hf_sr, hf_gt = wg(out, gt)
                use = step >= wavelet_init
                fake_in = jnp.where(use, hf_sr, out)
                real_in = jnp.where(use, hf_gt, gt)
            else:
                fake_in, real_in = out, gt
            if batch_d:
                # one D apply over real+fake stacked on batch: halves kernel
                # launches and spectral-norm recomputation vs two applies
                # (the SN discriminators have no cross-batch ops, so the
                # math is identical)
                pred, new_bs_d = apply_d(
                    params_d, bstats_d,
                    jnp.concatenate([real_in, fake_in], axis=0),
                    update_stats=True,
                )
                real_pred, fake_pred = jnp.split(pred, 2, axis=0)
            elif sn_once:
                # single power iteration per step (real apply); fake apply
                # reuses the stored u/v so it CSEs with the G-step forward
                real_pred, new_bs_d = apply_d(
                    params_d, bstats_d, real_in, update_stats=True
                )
                fake_pred, _ = apply_d(params_d, bstats_d, fake_in)
            else:
                # BN discriminator: two sequential torch-style forwards
                # (real first, then fake with real-updated running stats)
                real_pred, bs_mid = apply_d(
                    params_d, bstats_d, real_in, update_stats=True
                )
                fake_pred, new_bs_d = apply_d(
                    params_d, bs_mid, fake_in, update_stats=True
                )
            l_d_real = cri_gan(real_pred, True, is_disc=True).astype(jnp.float32)
            l_d_fake = cri_gan(fake_pred, False, is_disc=True).astype(jnp.float32)
            total = l_d_real + l_d_fake
            return total, ({"l_d_real": l_d_real, "l_d_fake": l_d_fake}, new_bs_d)

        def train_step(state: TrainState, lq: jax.Array, gt: jax.Array):
            # uint8 batches normalize on device: host->device traffic is 4x
            # smaller and the divide fuses into the first conv's input
            if jnp.issubdtype(lq.dtype, jnp.integer):
                lq = lq.astype(jnp.float32) / 255.0
            if gt is not None and jnp.issubdtype(gt.dtype, jnp.integer):
                gt = gt.astype(jnp.float32) / 255.0
            rng, step_rng, aug_rng = jax.random.split(state.rng, 3)
            step = state.step
            if paired_aug is not None and gt is not None and lq.shape[0] > 1:
                gt, lq = paired_aug(gt, lq, aug_rng)

            grad_fn = jax.value_and_grad(g_loss_fn, has_aux=True)
            (loss_g, (losses, out, bstats_g)), grads = grad_fn(
                state.params_g, state.params_d, lq, gt, step_rng, step,
                state.bstats_g, state.bstats_d,
            )

            sam_m, sam_t = state.sam_m, state.sam_t
            if sam is not None:
                # F-SAM (reference fsam.py:36-95): momentum-filtered ascent
                # direction, perturb, re-evaluate gradient at w + e(w).
                def sam_branch(args):
                    g1, m, t = args
                    initialized = t > 0
                    d = jax.tree.map(
                        lambda g, mm: jnp.where(initialized, g - sam_sigma * mm, g),
                        g1, m,
                    )
                    m_new = jax.tree.map(
                        lambda mm, g: jnp.where(
                            initialized, sam_lmbda * mm + (1 - sam_lmbda) * g, g
                        ),
                        m, g1,
                    )
                    if sam_adaptive:
                        norm = optax.global_norm(
                            jax.tree.map(lambda p, g: jnp.abs(p) * g,
                                         state.params_g, d)
                        )
                        e_w = jax.tree.map(
                            lambda p, g: p**2 * g * sam_rho / (norm + 1e-12),
                            state.params_g, d,
                        )
                    else:
                        norm = optax.global_norm(d)
                        e_w = jax.tree.map(
                            lambda g: g * sam_rho / (norm + 1e-12), d
                        )
                    perturbed = jax.tree.map(jnp.add, state.params_g, e_w)
                    (_, _), g2 = grad_fn(
                        perturbed, state.params_d, lq, gt, step_rng, step,
                        state.bstats_g, state.bstats_d,
                    )
                    return g2, m_new, t + 1

                def plain_branch(args):
                    g1, m, t = args
                    return g1, m, t

                grads, sam_m, sam_t = jax.lax.cond(
                    step >= sam_init, sam_branch, plain_branch,
                    (grads, state.sam_m, state.sam_t),
                )

            finite = jnp.isfinite(loss_g)
            flat_new_g = None
            if flat_apply_g:
                flat_p, unravel_g = jax.flatten_util.ravel_pytree(state.params_g)
                flat_gr, _ = jax.flatten_util.ravel_pytree(grads)
                updates_f, opt_g = optim_g.update(flat_gr, state.opt_g, flat_p)
                flat_new_g = jnp.where(
                    finite, flat_p + updates_f.astype(flat_p.dtype), flat_p
                )
                params_g = unravel_g(flat_new_g)
            else:
                updates, opt_g = optim_g.update(grads, state.opt_g, state.params_g)
                params_g = optax.apply_updates(state.params_g, updates)
                params_g = _tree_where(finite, params_g, state.params_g)
            opt_g = _tree_where(finite, opt_g, state.opt_g)

            params_d, opt_d = state.params_d, state.opt_d
            bstats_d = state.bstats_d
            if net_d is not None:
                (loss_d, (d_losses, bstats_d)), grads_d = jax.value_and_grad(
                    d_loss_fn, has_aux=True
                )(state.params_d, out, gt, step, state.bstats_d)
                losses.update(d_losses)
                finite_d = jnp.isfinite(loss_d)
                if flat_apply_d:
                    flat_pd, unravel_d = jax.flatten_util.ravel_pytree(
                        state.params_d)
                    flat_gd, _ = jax.flatten_util.ravel_pytree(grads_d)
                    updates_fd, opt_d = optim_d.update(
                        flat_gd, state.opt_d, flat_pd)
                    params_d = unravel_d(jnp.where(
                        finite_d, flat_pd + updates_fd.astype(flat_pd.dtype),
                        flat_pd,
                    ))
                else:
                    updates_d, opt_d = optim_d.update(
                        grads_d, state.opt_d, state.params_d)
                    params_d = optax.apply_updates(state.params_d, updates_d)
                    params_d = _tree_where(finite_d, params_d, state.params_d)
                opt_d = _tree_where(finite_d, opt_d, state.opt_d)
                bstats_d = _tree_where(finite_d, bstats_d, state.bstats_d)
                finite = finite & finite_d

            ema_g = state.ema_g
            if ema_decay > 0:
                if flat_new_g is not None:
                    flat_e, unravel_e = jax.flatten_util.ravel_pytree(
                        state.ema_g)
                    ema_g = unravel_e(
                        ema_decay * flat_e + (1.0 - ema_decay) * flat_new_g
                    )
                else:
                    ema_g = jax.tree.map(
                        lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                        state.ema_g, params_g,
                    )

            new_state = state.replace(
                step=state.step + 1,
                rng=rng,
                params_g=params_g,
                opt_g=opt_g,
                ema_g=ema_g,
                params_d=params_d,
                opt_d=opt_d,
                nan_count=state.nan_count + jnp.where(finite, 0, 1),
                sam_m=sam_m,
                sam_t=sam_t,
                bstats_g=_tree_where(finite, bstats_g, state.bstats_g),
                bstats_d=bstats_d,
            )
            return new_state, losses

        return train_step

    # ----------------------------------------------------------- data flow
    def feed_data(self, data: dict[str, Any]) -> None:
        batch = {k: v for k, v in data.items() if isinstance(v, np.ndarray)}
        batch = shard_batch(batch, self.mesh)
        self.lq = batch["lq"]
        self.gt = batch.get("gt")

    def optimize_parameters(self, current_iter: int) -> None:
        self.state, losses = self._train_step(self.state, self.lq, self.gt)
        self.log_dict = losses

    def get_current_log(self) -> dict[str, float]:
        out = {k: float(v) for k, v in self.log_dict.items()}
        nan = int(jax.device_get(self.state.nan_count)) if self.state is not None else 0
        if nan > 0:
            msg = f"{tc.red}NaN detected in {nan} training step(s). Aborting.{tc.end}"
            raise RuntimeError(msg)
        return out

    def get_current_learning_rate(self) -> list[float]:
        step = int(jax.device_get(self.state.step)) if self.state is not None else 0
        lrs = [current_lr(self.lr_g, step)]
        if self.lr_d is not None:
            lrs.append(current_lr(self.lr_d, step))
        return lrs

    # --------------------------------------------------------------- eval
    def _eval_params(self):
        """Parameters used for validation/inference (EMA > SF-average > raw)."""
        if not self.is_train or self.state is None:
            return self.eval_params
        state = self.state
        if self.ema_decay > 0:
            return state.ema_g
        if self.sf_g:
            return sf_eval_params(state.opt_g, state.params_g)
        return state.params_g

    def _eval_variables(self):
        """Full variable dict for inference: eval params + (for BN archs)
        the current running statistics."""
        variables = {"params": self._eval_params()}
        bstats = (
            self.state.bstats_g
            if (self.is_train and self.state is not None)
            else self.bstats_g
        )
        if bstats:
            variables["batch_stats"] = bstats
        return variables

    def _pad_multiple(self) -> int:
        """Spatial bucket for inference padding: a multiple of 64 (to limit
        recompiles) that the arch's window size divides (window-24 models
        would otherwise fail window partitioning)."""
        import math

        win = self.opt.get("network_g", {}).get("window_size", None)
        base = 64
        if isinstance(win, (list, tuple)):
            for w in win:
                base = math.lcm(base, int(w))
            return base
        if isinstance(win, int) and win > 0:
            return math.lcm(base, win)
        return base

    def test(self) -> None:
        """Run net_g on self.lq -> self.output (whole image or tiled)."""
        params = self._eval_variables()
        val_opt = self.opt.get("val") or {}
        tile = val_opt.get("tile", -1)
        lq = self.lq
        if tile == -1:
            self.output = self._padded_forward(params, lq, self._pad_multiple())
            return
        # tiled: in-graph scan (one dispatch, tiles never leave the device)
        # when the output canvas fits the HBM budget; the host-chunked path
        # handles arbitrarily large outputs with bounded device memory.
        mode = val_opt.get("tile_mode", "auto")
        if mode not in ("auto", "graph", "host"):
            msg = f"{tc.red}val.tile_mode must be auto|graph|host, got {mode!r}{tc.end}"
            raise ValueError(msg)
        overlap = int(val_opt.get("tile_overlap", 16))
        if mode == "auto":
            n, h, w, c = lq.shape
            budget = float(val_opt.get("tile_graph_budget_mb", 2048)) * 1e6
            canvas_bytes = n * (h * self.scale) * (w * self.scale) * c * 4 * 2.5
            mode = "graph" if (
                canvas_bytes <= budget and tile > 2 * overlap
            ) else "host"
        if mode == "graph":
            self.output = self._tiled_forward_graph(params, lq, tile, overlap)
        else:
            self.output = self._tiled_forward(params, lq, tile, overlap)

    def _padded_forward(self, params, lq, multiple: int = 64):
        """Pad H/W up to a bucket multiple (limits recompiles), then crop.
        Padding happens inside the jitted forward (reflect in-graph), so
        there is no per-image device->host->device round-trip."""
        n, h, w, c = lq.shape
        ph = -h % multiple
        pw = -w % multiple
        out = self._apply_fn(params, lq, ph, pw)
        s = self.scale
        return out[:, : h * s, : w * s, :]

    def _tiled_forward_graph(self, params, lq, tile: int, overlap: int = 16):
        """TPU-native tiled inference: the tile grid runs as one jitted
        `lax.scan` (dynamic_slice tile -> net_g -> dynamic_update_slice of
        the seam-cropped center), so a tiled image costs ONE dispatch and
        zero per-tile host traffic — vs the reference's per-tile loop
        (image.py:684-784) and our host-chunked `_tiled_forward`.

        The LQ gets an edge-replicate halo of `overlap` on every side: with
        overlap >= the net's receptive-field radius the tiled output EQUALS
        the whole-image forward everywhere except within one receptive
        field of the image border, where every tiling scheme necessarily
        deviates (parity-tested in tests/test_tiled_graph.py)."""
        assert tile > 2 * overlap, (
            "tile must exceed 2*overlap for the in-graph path"
        )
        win = self.opt.get("network_g", {}).get("window_size")
        wins = win if isinstance(win, (list, tuple)) else [win]
        for w in wins:
            if isinstance(w, int) and w > 0 and tile % w:
                msg = (
                    f"{tc.red}val.tile ({tile}) must be a multiple of the "
                    f"network window_size ({win}) for tiled inference.{tc.end}"
                )
                raise ValueError(msg)
        return self._tiled_graph_fn(params, lq, tile, overlap, self.scale)

    def _tiled_forward(self, params, lq, tile: int, overlap: int = 16,
                       tile_batch: int = 8):
        """Overlapping-tile inference with seam cropping (reference
        image.py:684-784 semantics).  Tiles are stacked and run through the
        net in fixed-size batches (`tile_batch`, padded on the last chunk),
        so the device sees one compile and ~T/tile_batch dispatches instead
        of a sync per tile."""
        n, h, w, c = lq.shape
        s = self.scale
        lq_np = np.asarray(jax.device_get(lq))
        out = np.zeros((n, h * s, w * s, c), dtype=np.float32)
        step = tile - 2 * overlap
        if step <= 0:
            step = tile
            overlap = 0
        ys = list(range(0, max(h - overlap, 1), step))
        xs = list(range(0, max(w - overlap, 1), step))

        # gather every (possibly edge-padded) tile for every batch image
        patches: list[np.ndarray] = []
        meta: list[tuple[int, int, int, int, int]] = []
        for y0 in ys:
            for x0 in xs:
                y1, x1 = min(y0 + tile, h), min(x0 + tile, w)
                y0c, x0c = max(y1 - tile, 0), max(x1 - tile, 0)
                patch = lq_np[:, y0c:y1, x0c:x1, :]
                pad_h = tile - patch.shape[1]
                pad_w = tile - patch.shape[2]
                if pad_h or pad_w:
                    patch = np.pad(
                        patch, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                        mode="reflect",
                    )
                patches.append(patch)
                meta.append((y0c, x0c, y1, x1, len(patches) - 1))
        stack = np.concatenate(patches, axis=0)  # (T*n, tile, tile, c)
        srs = np.empty((stack.shape[0], tile * s, tile * s, c), np.float32)
        for lo in range(0, stack.shape[0], tile_batch):
            chunk = stack[lo : lo + tile_batch]
            pad_n = tile_batch - chunk.shape[0]
            if pad_n:  # pad the last chunk to the compiled batch size
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad_n, axis=0)], axis=0)
            sr = np.asarray(self._apply_fn(params, chunk))
            srs[lo : lo + tile_batch] = sr[: tile_batch - pad_n]

        for y0c, x0c, y1, x1, t in meta:
            sr = srs[t * n : (t + 1) * n, : (y1 - y0c) * s, : (x1 - x0c) * s, :]
            # valid interior (crop seam overlap except at borders)
            ty0 = y0c * s + (overlap * s if y0c > 0 else 0)
            tx0 = x0c * s + (overlap * s if x0c > 0 else 0)
            sy0 = ty0 - y0c * s
            sx0 = tx0 - x0c * s
            out[:, ty0 : y1 * s, tx0 : x1 * s, :] = sr[:, sy0:, sx0:, :]
        return out

    def nondist_validation(
        self, dataloader, current_iter: int, tb_logger=None, save_img: bool = True
    ) -> None:
        dataset_name = dataloader.dataset.opt.get("name", "val")
        with_metrics = bool(self.opt.get("val", {}).get("metrics"))
        metric_results: dict[str, float] = {}
        if with_metrics:
            self._initialize_best_metric_results(dataset_name)
            metric_results = dict.fromkeys(self.opt["val"]["metrics"], 0.0)

        n_imgs = 0
        pbar = None
        if self.opt.get("val", {}).get("pbar", True):
            # reference image.py:800-885: tqdm progress over val images
            try:
                from tqdm import tqdm

                pbar = tqdm(total=len(dataloader.dataset), unit="image",
                            colour="green", ascii=" >=", ncols=75,
                            disable=None)
            except ImportError:
                pbar = None
        for val_data in dataloader:
            img_name = Path(val_data["lq_path"]).stem
            if pbar is not None:
                pbar.set_description(f"Inferring on {img_name}")
            self.feed_data(val_data)
            self.test()
            sr_img_rgb = tensor2img(jax.device_get(self.output), rgb2bgr=False)
            n_imgs += 1
            if pbar is not None:
                pbar.update(1)

            if (
                tb_logger is not None
                and self.opt.get("logger", {}).get("save_tb_img", False)
            ):
                tb_logger.add_image(
                    f"{dataset_name}/{img_name}",
                    sr_img_rgb, global_step=current_iter, dataformats="HWC",
                )

            if save_img:
                if self.opt["is_train"]:
                    save_path = (
                        Path(self.opt["path"]["visualization"]) / img_name
                        / f"{img_name}_{current_iter}.png"
                    )
                else:
                    suffix = self.opt.get("val", {}).get("suffix") or self.opt["name"]
                    save_path = (
                        Path(self.opt["path"]["visualization"]) / dataset_name
                        / f"{img_name}_{suffix}.png"
                    )
                imwrite(sr_img_rgb[..., ::-1], save_path)

            if with_metrics and "gt" in val_data:
                gt_img_rgb = tensor2img(np.asarray(val_data["gt"]), rgb2bgr=False)
                # guard size mismatch (odd val sizes)
                h = min(sr_img_rgb.shape[0], gt_img_rgb.shape[0])
                w = min(sr_img_rgb.shape[1], gt_img_rgb.shape[1])
                data = {"img": sr_img_rgb[:h, :w], "img2": gt_img_rgb[:h, :w]}
                for name, opt_ in self.opt["val"]["metrics"].items():
                    if opt_.get("device") and opt_.get("type") in (
                        "calculate_psnr", "calculate_ssim",
                    ):
                        # on-device fast path (same 0-255/crop/Y conventions)
                        from neosr_tpu.metrics.jax_metrics import psnr_jnp, ssim_jnp

                        fn = psnr_jnp if opt_["type"] == "calculate_psnr" else ssim_jnp
                        metric_results[name] += float(fn(
                            jnp.asarray(data["img"], jnp.float32),
                            jnp.asarray(data["img2"], jnp.float32),
                            crop_border=opt_.get("crop_border", 4),
                            test_y_channel=opt_.get("test_y_channel", False),
                        ))
                    else:
                        metric_results[name] += calculate_metric(data, opt_)

        if pbar is not None:
            pbar.close()
        if with_metrics and n_imgs:
            for metric in metric_results:
                metric_results[metric] /= n_imgs
                self._update_best_metric_result(
                    dataset_name, metric, metric_results[metric], current_iter
                )
            self._log_validation_metric_values(
                current_iter, dataset_name, tb_logger, metric_results
            )
            self.metric_results = metric_results

    def _load_ea2fpn_trunk(self, path: str, sha256: str | None = None) -> None:
        """Graft ImageNet ResNet18 weights (torchvision .pth) into the
        ea2fpn discriminator trunk — the reference builds its trunk from
        torchvision-pretrained resnet18 (ea2fpn_arch.py:214); config keys
        [network_d] trunk_weights_path / trunk_weights_sha256."""
        import torch

        from neosr_tpu.losses.vgg import verify_sha256
        from neosr_tpu.utils.checkpoint import unflatten_params
        from neosr_tpu.utils.torch_interop import BATCH_STATS_PREFIX
        from neosr_tpu.utils.torch_interop_ext import convert_resnet18_trunk

        verify_sha256(path, sha256)
        sd = torch.load(path, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
        flat = convert_resnet18_trunk(sd)
        stats_flat = {
            k[len(BATCH_STATS_PREFIX):]: v
            for k, v in flat.items() if k.startswith(BATCH_STATS_PREFIX)
        }
        params_flat = {
            k: v for k, v in flat.items()
            if not k.startswith(BATCH_STATS_PREFIX)
        }
        scope = "ResNet18Trunk_0"
        self.params_d = dict(self.params_d)
        self.params_d[scope] = jax.tree.map(
            lambda t, l: jnp.asarray(l).astype(t.dtype).reshape(t.shape),
            self.params_d[scope], unflatten_params(params_flat),
        )
        if stats_flat and scope in self.bstats_d:
            self.bstats_d = dict(self.bstats_d)
            self.bstats_d[scope] = jax.tree.map(
                lambda t, l: jnp.asarray(l).astype(t.dtype).reshape(t.shape),
                self.bstats_d[scope], unflatten_params(stats_flat),
            )
        get_root_logger().info(f"ea2fpn trunk weights loaded from {path}")

    # --------------------------------------------------------- checkpoints
    def _load_network(self, target, load_path: str, param_key: str, strict: bool,
                      net: str = "network_g"):
        logger = get_root_logger()
        suffix = Path(load_path).suffix.lower()
        loaded_stats = None
        if suffix in (".pth", ".pt"):
            # reference-ecosystem torch checkpoint: convert key layout
            # (reference save format base.py:281-354; openmodeldb models)
            from neosr_tpu.utils.torch_interop import load_torch_checkpoint

            arch_type = self.opt.get(net, {}).get("type", "")
            loaded, loaded_stats = load_torch_checkpoint(
                load_path, arch_type, param_key, with_stats=True
            )
        elif suffix == ".safetensors":
            from neosr_tpu.utils.checkpoint import load_safetensors

            loaded = load_safetensors(load_path)
        else:
            loaded = load_pytree(load_path)
        if isinstance(loaded, dict) and "batch_stats" in loaded:
            loaded_stats = loaded["batch_stats"]
        for key in (param_key, "params-ema", "params_ema", "params"):
            if isinstance(loaded, dict) and key in loaded:
                loaded = loaded[key]
                break
        # BN running statistics travel with the checkpoint (torch
        # state_dicts carry running_mean/var; our .ckpt payloads carry the
        # batch_stats collection)
        if loaded_stats:
            stats_attr = "bstats_g" if net == "network_g" else "bstats_d"
            tgt_stats = getattr(self, stats_attr, None)
            if tgt_stats:
                try:
                    setattr(self, stats_attr, jax.tree.map(
                        lambda t, l: jnp.asarray(l).astype(t.dtype).reshape(t.shape),
                        tgt_stats, loaded_stats,
                    ))
                    logger.info(f"Loaded BN running statistics from {load_path}")
                except Exception as e:
                    if strict:
                        msg = f"Failed strict batch-stats load from {load_path}: {e}"
                        raise ValueError(msg) from e
                    logger.warning(f"Skipping mismatched batch_stats: {e}")
        try:
            restored = jax.tree.map(lambda t, l: jnp.asarray(l).astype(t.dtype).reshape(t.shape),
                                    target, loaded)
            logger.info(f"Loaded pretrained network from {load_path}")
            return restored
        except Exception as e:
            if strict:
                msg = f"Failed strict load from {load_path}: {e}"
                raise ValueError(msg) from e
            logger.warning(f"Non-strict load from {load_path}: merging matching keys")
            # fall back: merge by identical nested paths
            def merge(t, l):
                if isinstance(t, dict) and isinstance(l, dict):
                    return {k: merge(t[k], l[k]) if k in l else t[k] for k in t}
                try:
                    arr = jnp.asarray(l)
                    return arr if arr.shape == t.shape else t
                except Exception:
                    return t
            return merge(target, loaded)

    def save(self, epoch: int, current_iter: int) -> None:
        if self.opt.get("rank", 0) != 0:
            return
        models_dir = Path(self.opt["path"]["models"])
        state = jax.device_get(self.state)

        # EMA (or SF-averaged) weights saved as net_g (reference image.py:932-942)
        params_main = jax.device_get(self._eval_params())
        payload = {"params": params_main}
        if self.ema_decay > 0:
            payload["params_ema"] = params_main
            payload["params"] = state.params_g
        if jax.tree.leaves(state.bstats_g):
            payload["batch_stats"] = state.bstats_g
        save_pytree(models_dir / f"net_g_{current_iter}.ckpt", payload)
        if state.params_d is not None:
            payload_d = {"params": state.params_d}
            if jax.tree.leaves(state.bstats_d):
                payload_d["batch_stats"] = state.bstats_d
            save_pytree(models_dir / f"net_d_{current_iter}.ckpt", payload_d)

        train_state = {
            "epoch": epoch,
            "iter": current_iter,
            "step": state.step,
            "rng": jax.random.key_data(state.rng),
            "params_g": state.params_g,
            "opt_g": state.opt_g,
            "ema_g": state.ema_g,
            "params_d": state.params_d,
            "opt_d": state.opt_d,
            "bstats_g": state.bstats_g,
            "bstats_d": state.bstats_d,
        }
        save_pytree(
            Path(self.opt["path"]["training_states"]) / f"{current_iter}.state",
            train_state,
        )

    def resume_training(self, resume_state: dict[str, Any]) -> None:
        host_state = jax.device_get(self.state)
        target = {
            "epoch": 0,
            "iter": 0,
            "step": host_state.step,
            "rng": jax.random.key_data(host_state.rng),
            "params_g": host_state.params_g,
            "opt_g": host_state.opt_g,
            "ema_g": host_state.ema_g,
            "params_d": host_state.params_d,
            "opt_d": host_state.opt_d,
            "bstats_g": host_state.bstats_g,
            "bstats_d": host_state.bstats_d,
        }
        try:
            restored = load_pytree(resume_state["path"], target)
        except Exception:
            # optimizer-state layout mismatch (the `fused` flag flattens
            # moment buffers — optax.flatten — so checkpoints written with
            # the other setting have a different tree).  Detect and convert
            # instead of failing (ADVICE r2: resume across layout change).
            from flax import serialization

            raw = load_pytree(resume_state["path"])  # structure-free restore
            from neosr_tpu.optimizers import adapt_opt_layout

            get_root_logger().warning(
                "Resume state layout differs from runtime (fused-optimizer "
                "setting changed?) — converting optimizer buffers."
            )
            # states written before batch_stats existed lack these keys
            raw.setdefault(
                "bstats_g", serialization.to_state_dict(host_state.bstats_g)
            )
            raw.setdefault(
                "bstats_d", serialization.to_state_dict(host_state.bstats_d)
            )
            raw["opt_g"] = adapt_opt_layout(
                raw["opt_g"], host_state.opt_g, host_state.params_g
            )
            if host_state.opt_d is not None and raw.get("opt_d") is not None:
                raw["opt_d"] = adapt_opt_layout(
                    raw["opt_d"], host_state.opt_d, host_state.params_d
                )
            restored = serialization.from_state_dict(target, raw)
        self.resume_epoch = int(restored["epoch"])
        self.resume_iter = int(restored["iter"])
        new_state = host_state.replace(
            step=jnp.asarray(restored["step"]),
            rng=jax.random.wrap_key_data(restored["rng"]),
            params_g=restored["params_g"],
            opt_g=restored["opt_g"],
            ema_g=restored["ema_g"],
            params_d=restored["params_d"],
            opt_d=restored["opt_d"],
            bstats_g=restored["bstats_g"],
            bstats_d=restored["bstats_d"],
        )
        self.state = replicate(new_state, self.mesh)

    def export(self, path: str | Path) -> None:
        """Safetensors export of the eval weights (ecosystem interop)."""
        export_safetensors(path, self._eval_params(), {"framework": "neosr_tpu"})
