"""Torch mirror modules for ONNX export.

The reference exports ONNX through `torch.onnx.export` on its torch
generators (/root/reference/convert.py:89-182).  Our generators are flax;
to reach the same deployment artifact without the (absent) jax2onnx
package, we mirror the *deploy-path* forward of the popular conv archs as
tiny torch modules whose parameter names equal the reference checkpoint
layout — the same layout our torch-layout exporters
(utils/torch_interop.py) already emit.  Export chain:

    flax params --export_<arch>--> reference-layout state_dict
               --load into mirror--> torch module
               --torch.onnx.export--> .onnx (opset 17)

and parity is asserted mirror-vs-flax on random input (the reference
asserts ORT-vs-torch at rtol 0.01/atol 0.001, convert.py:65-86).

These mirrors implement the forward passes of OUR flax archs
(archs/compact.py, archs/span.py, archs/esrgan.py) in torch — they are not
ports of the reference module code.  Only the deploy path is mirrored
(e.g. span uses the fused Conv3XC eval_conv, so the train-time branch
keys in the state dict are simply unused).

torch 2.13 requires the `onnx` package only for a final post-processing
step that splices onnxscript custom functions into the serialized proto
(_add_onnxscript_fn).  Standard conv/prelu/pixel-shuffle graphs contain
none, in which case that step is the identity — `ensure_onnx_exportable`
patches it through when `onnx` is unavailable.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def ensure_onnx_exportable() -> None:
    """Allow torch.onnx.export to serialize without the `onnx` package.

    `_add_onnxscript_fn(model_bytes, custom_opsets) -> bytes` only rewrites
    the proto when the graph references onnxscript-defined custom ops; for
    the standard op set it returns its input unchanged — except it imports
    `onnx` unconditionally first.  Patch it to the identity when the
    import fails.
    """
    try:
        import onnx  # noqa: F401

        return  # real package present; no patch needed
    except ImportError:
        pass
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    onnx_proto_utils._add_onnxscript_fn = (
        lambda model_bytes, custom_opsets: model_bytes
    )


# --------------------------------------------------------------------- archs


def _compact_mirror(opt: dict[str, Any], scale: int):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    num_feat = opt.get("num_feat", 64)
    num_conv = opt.get("num_conv", 16)
    num_out = opt.get("num_out_ch", 3)
    act = opt.get("act_type", "prelu")
    if act != "prelu":
        msg = f"compact ONNX mirror supports act_type='prelu' only, got {act}"
        raise ValueError(msg)

    class CompactMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            layers: list[nn.Module] = []
            c_in = opt.get("num_in_ch", 3)
            for _ in range(num_conv + 1):
                layers += [nn.Conv2d(c_in, num_feat, 3, padding=1),
                           nn.PReLU(num_feat)]
                c_in = num_feat
            layers.append(nn.Conv2d(num_feat, num_out * scale**2, 3, padding=1))
            self.body = nn.Sequential(*layers)
            self.ps = nn.PixelShuffle(scale)

        def forward(self, x: "torch.Tensor") -> "torch.Tensor":
            out = self.ps(self.body(x))
            return out + F.interpolate(x, scale_factor=scale, mode="nearest")

    return CompactMirror()


def _span_mirror(opt: dict[str, Any], scale: int):
    import torch
    import torch.nn as nn

    feat = opt.get("feature_channels", 48)
    num_out = opt.get("num_out_ch", 3)
    if opt.get("norm", False):
        msg = "span ONNX mirror supports norm=false checkpoints only"
        raise ValueError(msg)

    class C3XC(nn.Module):  # fused deploy conv of the re-parameterizable block
        def __init__(self, c_in: int, c_out: int) -> None:
            super().__init__()
            self.eval_conv = nn.Conv2d(c_in, c_out, 3, padding=1)

        def forward(self, x):
            return self.eval_conv(x)

    class SPABMirror(nn.Module):
        def __init__(self, c: int) -> None:
            super().__init__()
            self.c1_r, self.c2_r, self.c3_r = C3XC(c, c), C3XC(c, c), C3XC(c, c)

        def forward(self, x):
            out1_act = torch.nn.functional.silu(self.c1_r(x))
            out2 = self.c2_r(out1_act)
            out3 = self.c3_r(torch.nn.functional.silu(out2))
            att = torch.sigmoid(out3) - 0.5
            return (out3 + x) * att, out1_act

    class SpanMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.conv_1 = C3XC(opt.get("num_in_ch", 3), feat)
            for i in range(1, 7):
                setattr(self, f"block_{i}", SPABMirror(feat))
            self.conv_2 = C3XC(feat, feat)
            self.conv_cat = nn.Conv2d(4 * feat, feat, 1)
            self.upsampler = nn.Sequential(
                nn.Conv2d(feat, num_out * scale**2, 3, padding=1),
                nn.PixelShuffle(scale),
            )

        def forward(self, x):
            f0 = self.conv_1(x)
            b1, _ = self.block_1(f0)
            b2, _ = self.block_2(b1)
            b3, _ = self.block_3(b2)
            b4, _ = self.block_4(b3)
            b5, _ = self.block_5(b4)
            b6, b5_2 = self.block_6(b5)
            b6 = self.conv_2(b6)
            out = self.conv_cat(torch.cat([f0, b6, b1, b5_2], dim=1))
            return self.upsampler(out)

    return SpanMirror()


def _esrgan_mirror(opt: dict[str, Any], scale: int):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    num_feat = opt.get("num_feat", 64)
    num_block = opt.get("num_block", 23)
    gc = opt.get("num_grow_ch", 32)
    num_out = opt.get("num_out_ch", 3)
    c_in = opt.get("num_in_ch", 3) * {1: 16, 2: 4}.get(scale, 1)

    class RDBMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            for k in range(1, 5):
                setattr(self, f"conv{k}",
                        nn.Conv2d(num_feat + (k - 1) * gc, gc, 3, padding=1))
            self.conv5 = nn.Conv2d(num_feat + 4 * gc, num_feat, 3, padding=1)

        def forward(self, x):
            a = F.leaky_relu(self.conv1(x), 0.2)
            b = F.leaky_relu(self.conv2(torch.cat([x, a], 1)), 0.2)
            c = F.leaky_relu(self.conv3(torch.cat([x, a, b], 1)), 0.2)
            d = F.leaky_relu(self.conv4(torch.cat([x, a, b, c], 1)), 0.2)
            e = self.conv5(torch.cat([x, a, b, c, d], 1))
            return e * 0.2 + x

    class RRDBMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.rdb1, self.rdb2, self.rdb3 = RDBMirror(), RDBMirror(), RDBMirror()

        def forward(self, x):
            return self.rdb3(self.rdb2(self.rdb1(x))) * 0.2 + x

    class EsrganMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.conv_first = nn.Conv2d(c_in, num_feat, 3, padding=1)
            self.body = nn.Sequential(*[RRDBMirror() for _ in range(num_block)])
            self.conv_body = nn.Conv2d(num_feat, num_feat, 3, padding=1)
            self.conv_up1 = nn.Conv2d(num_feat, num_feat, 3, padding=1)
            self.conv_up2 = nn.Conv2d(num_feat, num_feat, 3, padding=1)
            self.conv_hr = nn.Conv2d(num_feat, num_feat, 3, padding=1)
            self.conv_last = nn.Conv2d(num_feat, num_out, 3, padding=1)

        def forward(self, x):
            if scale == 2:
                x = F.pixel_unshuffle(x, 2)
            elif scale == 1:
                x = F.pixel_unshuffle(x, 4)
            feat = self.conv_first(x)
            feat = feat + self.conv_body(self.body(feat))
            up = F.interpolate(feat, scale_factor=2, mode="nearest")
            feat = F.leaky_relu(self.conv_up1(up), 0.2)
            up = F.interpolate(feat, scale_factor=2, mode="nearest")
            feat = F.leaky_relu(self.conv_up2(up), 0.2)
            return self.conv_last(F.leaky_relu(self.conv_hr(feat), 0.2))

    return EsrganMirror()


def _mish(t):
    import torch

    return t * torch.tanh(torch.nn.functional.softplus(t))


def _dysample_mirror(c_in: int, c_out: int, scale: int, groups: int = 4,
                     end_convolution: bool = True):
    """Torch expression of our flax DySample (archs/arch_util.py): offset
    prediction -> absolute bilinear sampling grid -> grouped grid_sample
    (GridSample is ONNX opset>=16).  Border clamp + align_corners=False
    reproduce the flax clip-gather exactly."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class DySampleMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            r, g = scale, groups
            self.offset = nn.Conv2d(c_in, 2 * g * r * r, 1)
            self.scope = nn.Conv2d(c_in, 2 * g * r * r, 1, bias=False)
            if end_convolution:
                self.end_conv = nn.Conv2d(c_in, c_out, 1)
            self.register_buffer("init_pos", torch.zeros(1, 2 * g * r * r, 1, 1))

        def forward(self, x):
            r, g = scale, groups
            b, c, h, w = x.shape
            off = self.offset(x) * torch.sigmoid(self.scope(x)) * 0.5
            off = off + self.init_pos
            # channel layout (2, g, ry, rx); spread subpixels into the HR
            # grid as (B, H*r, W*r, g, 2) of (x, y) offsets
            off = off.view(b, 2, g, r, r, h, w)
            off = off.permute(0, 5, 3, 6, 4, 2, 1).reshape(b, h * r, w * r, g, 2)
            bx = torch.arange(w * r, device=x.device, dtype=x.dtype) // r
            by = torch.arange(h * r, device=x.device, dtype=x.dtype) // r
            gx = off[..., 0] + bx.view(1, 1, -1, 1) + 0.5
            gy = off[..., 1] + by.view(1, -1, 1, 1) + 0.5
            grid = torch.stack([2 * gx / w - 1, 2 * gy / h - 1], dim=-1)
            grid = grid.permute(0, 3, 1, 2, 4).reshape(b * g, h * r, w * r, 2)
            xg = x.view(b * g, c // g, h, w)
            out = F.grid_sample(xg, grid, mode="bilinear",
                                align_corners=False, padding_mode="border")
            out = out.view(b, c, h * r, w * r)
            if end_convolution:
                out = self.end_conv(out)
            return out

    return DySampleMirror()


def _realplksr_mirror(opt: dict[str, Any], scale: int):
    import torch
    import torch.nn as nn

    dim = opt.get("dim", 64)
    n_blocks = opt.get("n_blocks", 28)
    ksize = opt.get("kernel_size", 17)
    pdim = int(dim * opt.get("split_ratio", 0.25))
    use_ea = opt.get("use_ea", True)
    groups = opt.get("norm_groups", 4)
    out_ch = opt.get("out_ch", 3)
    dys = opt.get("dysample", False)

    class EAMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.f = nn.Sequential(nn.Conv2d(dim, dim, 3, padding=1))

        def forward(self, x):
            return x * torch.sigmoid(self.f(x))

    class PLKMirror(nn.Module):  # partial large-kernel conv
        def __init__(self) -> None:
            super().__init__()
            self.conv = nn.Conv2d(pdim, pdim, ksize, padding=ksize // 2)

        def forward(self, x):
            return torch.cat([self.conv(x[:, :pdim]), x[:, pdim:]], dim=1)

    class BlockMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.channel_mixer = nn.Sequential(
                nn.Conv2d(dim, dim * 2, 3, padding=1), nn.Identity(),
                nn.Conv2d(dim * 2, dim, 3, padding=1),
            )
            self.lk = PLKMirror()
            if use_ea:
                self.attn = EAMirror()
            self.refine = nn.Conv2d(dim, dim, 1)
            self.norm = nn.GroupNorm(groups, dim)

        def forward(self, x):
            skip = x
            x = self.channel_mixer[0](x)
            x = self.channel_mixer[2](_mish(x))
            x = self.lk(x)
            if use_ea:
                x = self.attn(x)
            return self.norm(self.refine(x)) + skip

    class RealPLKSRMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            in_ch = opt.get("in_ch", 3)
            layers: list[nn.Module] = [nn.Conv2d(in_ch, dim, 3, padding=1)]
            layers += [BlockMirror() for _ in range(n_blocks)]
            layers.append(nn.Identity())  # dropout slot in the layout
            layers.append(nn.Conv2d(dim, out_ch * scale**2, 3, padding=1))
            self.feats = nn.Sequential(*layers)
            if dys and scale != 1:
                g = out_ch if scale % 2 != 0 else 4
                self.to_img = _dysample_mirror(
                    in_ch * scale**2, out_ch, scale, groups=g)
            else:
                self.to_img = nn.PixelShuffle(scale)

        def forward(self, x):
            out = self.feats(x) + x.repeat_interleave(scale**2, dim=1)
            return self.to_img(out)

    return RealPLKSRMirror()


def _plksr_mirror(opt: dict[str, Any], scale: int):
    import torch
    import torch.nn as nn

    dim = opt.get("dim", 64)
    n_blocks = opt.get("n_blocks", 28)
    ksize = opt.get("kernel_size", 17)
    pdim = int(dim * opt.get("split_ratio", 0.25))
    use_ea = opt.get("use_ea", True)
    ccm = opt.get("ccm_type", "DCCM")
    lk_type = opt.get("lk_type", "PLK")
    with_idt = opt.get("with_idt", False)
    if lk_type != "PLK":
        msg = f"plksr ONNX mirror supports lk_type='PLK' only, got {lk_type}"
        raise ValueError(msg)
    gelu = nn.GELU()  # exact (erf) — matches the flax zoo's gelu

    class EAMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.f = nn.Sequential(nn.Conv2d(dim, dim, 3, padding=1))

        def forward(self, x):
            return x * torch.sigmoid(self.f(x))

    class BlockMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            k0, k2 = {"DCCM": (3, 3), "CCM": (3, 1), "ICCM": (1, 3)}[ccm]
            self.channe_mixer = nn.Sequential(  # (sic) reference spelling
                nn.Conv2d(dim, dim * 2, k0, padding=k0 // 2), nn.Identity(),
                nn.Conv2d(dim * 2, dim, k2, padding=k2 // 2),
            )

            class LK(nn.Module):
                def __init__(self) -> None:
                    super().__init__()
                    self.conv = nn.Conv2d(pdim, pdim, ksize, padding=ksize // 2)

                def forward(self, x):
                    y = self.conv(x[:, :pdim])
                    if with_idt:
                        y = y + x[:, :pdim]
                    return torch.cat([y, x[:, pdim:]], dim=1)

            self.lk = LK()
            if use_ea:
                self.attn = EAMirror()
            self.refine = nn.Conv2d(dim, dim, 1)

        def forward(self, x):
            skip = x
            x = self.channe_mixer[2](gelu(self.channe_mixer[0](x)))
            x = self.lk(x)
            if use_ea:
                x = self.attn(x)
            return self.refine(x) + skip

    class PLKSRMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            layers: list[nn.Module] = [nn.Conv2d(3, dim, 3, padding=1)]
            layers += [BlockMirror() for _ in range(n_blocks)]
            layers.append(nn.Conv2d(dim, 3 * scale**2, 3, padding=1))
            self.feats = nn.Sequential(*layers)
            self.ps = nn.PixelShuffle(scale)

        def forward(self, x):
            return self.ps(self.feats(x) + x.repeat_interleave(scale**2, dim=1))

    return PLKSRMirror()


def _spanplus_mirror(opt: dict[str, Any], scale: int):
    import torch
    import torch.nn as nn

    feat = opt.get("feature_channels", 48)
    blocks = opt.get("blocks", (4,))
    blocks = list(blocks) if isinstance(blocks, (list, tuple)) else [int(blocks)]
    upsampler = opt.get("upsampler", "dys")
    num_in = opt.get("num_in_ch", 3)
    num_out = opt.get("num_out_ch", 3)
    out_ch = num_out if upsampler == "dys" else num_in

    class C3XC(nn.Module):
        def __init__(self, c_in: int, c_out: int) -> None:
            super().__init__()
            self.eval_conv = nn.Conv2d(c_in, c_out, 3, padding=1)

        def forward(self, x):
            return self.eval_conv(x)

    class SPABPlusMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.c1_r, self.c2_r, self.c3_r = (
                C3XC(feat, feat), C3XC(feat, feat), C3XC(feat, feat))

        def forward(self, x):
            out1_act = _mish(self.c1_r(x))
            out3 = self.c3_r(_mish(self.c2_r(out1_act)))
            att = torch.sigmoid(out3) - 0.5
            return (out3 + x) * att, out1_act

    class SPABSMirror(nn.Module):
        def __init__(self, n: int) -> None:
            super().__init__()
            self.block_1 = SPABPlusMirror()
            self.block_n = nn.ModuleList(SPABPlusMirror() for _ in range(n))
            self.block_end = SPABPlusMirror()
            self.conv_2 = C3XC(feat, feat)
            self.conv_cat = nn.Conv2d(4 * feat, feat, 1)

        def forward(self, x):
            b1, _ = self.block_1(x)
            h = b1
            for blk in self.block_n:
                h, _ = blk(h)
            end, x2 = self.block_end(h)
            end = self.conv_2(end)
            return self.conv_cat(torch.cat([x, end, b1, x2], dim=1))

    class SpanPlusMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.feats = nn.Sequential(
                C3XC(num_in, feat), *[SPABSMirror(n) for n in blocks])
            if upsampler == "ps":
                self.upsampler = nn.Sequential(
                    nn.Conv2d(feat, out_ch * scale**2, 3, padding=1),
                    nn.PixelShuffle(scale),
                )
            elif upsampler == "dys":
                self.upsampler = _dysample_mirror(feat, out_ch, scale)
            else:
                msg = f"spanplus ONNX mirror: unsupported upsampler {upsampler}"
                raise ValueError(msg)

        def forward(self, x):
            return self.upsampler(self.feats(x))

    return SpanPlusMirror()


def _swinir_mirror(opt: dict[str, Any], scale: int):
    """Torch mirror of our flax swinir (archs/swinir.py, swin_util.py).

    Works in (B, H, W, C) layout internally like the flax net (one NCHW
    permute per conv); window partition/shift/bias/mask math mirrors
    swin_util.  Input H, W must be multiples of window_size (like the flax
    forward; export with `-static` sized accordingly)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from neosr_tpu.archs.swin_util import (
        relative_position_index,
        shift_attn_mask,
    )

    dim = opt.get("embed_dim", 60)
    depths = list(opt.get("depths", (6, 6, 6, 6)))
    heads = list(opt.get("num_heads", (6,) * len(depths)))
    win = opt.get("window_size", 8)
    mlp_ratio = opt.get("mlp_ratio", 2.0)
    qkv_bias = opt.get("qkv_bias", True)
    patch_norm = opt.get("patch_norm", True)
    img_range = opt.get("img_range", 1.0)
    upsampler = opt.get("upsampler", "pixelshuffle")
    resi = opt.get("resi_connection", "1conv")
    in_chans = opt.get("in_chans", 3)
    num_feat = 64

    def conv2d_bhwc(conv: nn.Conv2d, x):
        return conv(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)

    class AttnMirror(nn.Module):
        def __init__(self, n_heads: int) -> None:
            super().__init__()
            self.n_heads = n_heads
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.proj = nn.Linear(dim, dim)
            self.relative_position_bias_table = nn.Parameter(
                torch.zeros((2 * win - 1) ** 2, n_heads))
            idx = torch.from_numpy(
                relative_position_index(win, win).copy()).long()
            self.register_buffer("rpi", idx, persistent=False)

        def forward(self, xw, mask):
            # xw: (B_, N, C) windows
            b_, n, c = xw.shape
            d = c // self.n_heads
            qkv = self.qkv(xw).reshape(b_, n, 3, self.n_heads, d)
            qkv = qkv.permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q * d**-0.5) @ k.transpose(-2, -1)
            bias = self.relative_position_bias_table[self.rpi.view(-1)]
            bias = bias.view(n, n, self.n_heads).permute(2, 0, 1)
            attn = attn + bias.unsqueeze(0)
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.view(b_ // nw, nw, self.n_heads, n, n)
                attn = attn + mask.unsqueeze(0).unsqueeze(2)
                attn = attn.view(b_, self.n_heads, n, n)
            attn = torch.softmax(attn, dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(b_, n, c)
            return self.proj(out)

    class BlockMirror(nn.Module):
        def __init__(self, n_heads: int, shift: int) -> None:
            super().__init__()
            self.shift = shift
            self.norm1 = nn.LayerNorm(dim, eps=1e-5)
            self.attn = AttnMirror(n_heads)
            self.norm2 = nn.LayerNorm(dim, eps=1e-5)
            hidden = int(dim * mlp_ratio)
            self.mlp = nn.ModuleDict({
                "fc1": nn.Linear(dim, hidden), "fc2": nn.Linear(hidden, dim)})

        def forward(self, x):
            b, h, w, c = x.shape
            shift = self.shift if min(h, w) > win else 0
            shortcut = x
            x = self.norm1(x)
            if shift > 0:
                x = torch.roll(x, (-shift, -shift), dims=(1, 2))
                mask = torch.from_numpy(
                    shift_attn_mask(h, w, win, shift).copy()).to(x.dtype)
            else:
                mask = None
            xw = x.view(b, h // win, win, w // win, win, c)
            xw = xw.permute(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)
            xw = self.attn(xw, mask)
            x = xw.view(b, h // win, w // win, win, win, c)
            x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
            if shift > 0:
                x = torch.roll(x, (shift, shift), dims=(1, 2))
            x = shortcut + x
            y = F.gelu(self.mlp["fc1"](self.norm2(x)))
            return x + self.mlp["fc2"](y)

    class RSTBMirror(nn.Module):
        def __init__(self, depth: int, n_heads: int) -> None:
            super().__init__()
            self.residual_group = nn.ModuleDict({"blocks": nn.ModuleList(
                BlockMirror(n_heads, 0 if j % 2 == 0 else win // 2)
                for j in range(depth))})
            if resi == "1conv":
                self.conv = nn.Conv2d(dim, dim, 3, padding=1)
            else:
                self.conv = nn.Sequential(
                    nn.Conv2d(dim, dim // 4, 3, padding=1), nn.Identity(),
                    nn.Conv2d(dim // 4, dim // 4, 1), nn.Identity(),
                    nn.Conv2d(dim // 4, dim, 3, padding=1))

        def forward(self, x):
            res = x
            for blk in self.residual_group["blocks"]:
                x = blk(x)
            if resi == "1conv":
                x = conv2d_bhwc(self.conv, x)
            else:
                x = x.permute(0, 3, 1, 2)
                x = F.leaky_relu(self.conv[0](x), 0.2)
                x = F.leaky_relu(self.conv[2](x), 0.2)
                x = self.conv[4](x).permute(0, 2, 3, 1)
            return x + res

    class SwinIRMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.conv_first = nn.Conv2d(in_chans, dim, 3, padding=1)
            if patch_norm:
                self.patch_embed = nn.ModuleDict(
                    {"norm": nn.LayerNorm(dim, eps=1e-5)})
            self.layers = nn.ModuleList(
                RSTBMirror(d, h) for d, h in zip(depths, heads))
            self.norm = nn.LayerNorm(dim, eps=1e-5)
            if upsampler == "pixelshuffle":
                self.conv_after_body = nn.Conv2d(dim, dim, 3, padding=1)
                self.conv_before_upsample = nn.Sequential(
                    nn.Conv2d(dim, num_feat, 3, padding=1))
                ups: list[nn.Module] = []
                s = scale
                while s % 2 == 0 and s > 1:
                    ups += [nn.Conv2d(num_feat, 4 * num_feat, 3, padding=1),
                            nn.PixelShuffle(2)]
                    s //= 2
                if s == 3:
                    ups += [nn.Conv2d(num_feat, 9 * num_feat, 3, padding=1),
                            nn.PixelShuffle(3)]
                self.upsample = nn.Sequential(*ups)
                self.conv_last = nn.Conv2d(num_feat, in_chans, 3, padding=1)
            elif upsampler == "pixelshuffledirect":
                self.conv_after_body = nn.Conv2d(dim, dim, 3, padding=1)
                self.upsample = nn.Sequential(
                    nn.Conv2d(dim, in_chans * scale**2, 3, padding=1),
                    nn.PixelShuffle(scale))
            else:
                msg = f"swinir ONNX mirror: unsupported upsampler {upsampler}"
                raise ValueError(msg)

        def forward(self, x):
            mean = 0.5 if in_chans == 3 else 0.0
            x = (x - mean) * img_range
            feat = self.conv_first(x).permute(0, 2, 3, 1)  # BHWC
            h = feat
            if patch_norm:
                h = self.patch_embed["norm"](h)
            for layer in self.layers:
                h = layer(h)
            h = self.norm(h)
            h = conv2d_bhwc(self.conv_after_body, h) + feat
            h = h.permute(0, 3, 1, 2)  # NCHW for the head
            if upsampler == "pixelshuffle":
                h = F.leaky_relu(self.conv_before_upsample[0](h), 0.01)
                out = self.conv_last(self.upsample(h))
            else:
                out = self.upsample(h)
            return out / img_range + mean

    return SwinIRMirror()


def _hat_mirror(opt: dict[str, Any], scale: int):
    """Torch mirror of our flax HAT (archs/hat.py): HAB (W-MSA + channel-
    attention conv branch, conv_scale) + OCAB per group, pixelshuffle head.
    BHWC-internal like the swinir mirror; static window-multiple sizes."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from neosr_tpu.archs.hat import rpi_oca
    from neosr_tpu.archs.swin_util import (
        relative_position_index,
        shift_attn_mask,
    )

    dim = opt.get("embed_dim", 96)
    depths = list(opt.get("depths", (6, 6, 6, 6)))
    heads = list(opt.get("num_heads", (6,) * len(depths)))
    win = opt.get("window_size", 7)
    compress = opt.get("compress_ratio", 3)
    squeeze = opt.get("squeeze_factor", 30)
    conv_scale = opt.get("conv_scale", 0.01)
    overlap = opt.get("overlap_ratio", 0.5)
    mlp_ratio = opt.get("mlp_ratio", 4.0)
    qkv_bias = opt.get("qkv_bias", True)
    patch_norm = opt.get("patch_norm", True)
    img_range = opt.get("img_range", 1.0)
    in_chans = opt.get("in_chans", 3)
    num_feat = 64
    wse = int(overlap * win) + win

    class MlpM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            hidden = int(dim * mlp_ratio)
            self.fc1, self.fc2 = nn.Linear(dim, hidden), nn.Linear(hidden, dim)

        def forward(self, x):
            return self.fc2(F.gelu(self.fc1(x)))

    class AttnMirror(nn.Module):  # same math as the swinir mirror W-MSA
        def __init__(self, n_heads: int) -> None:
            super().__init__()
            self.n_heads = n_heads
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.proj = nn.Linear(dim, dim)
            self.relative_position_bias_table = nn.Parameter(
                torch.zeros((2 * win - 1) ** 2, n_heads))
            self.register_buffer(
                "rpi",
                torch.from_numpy(relative_position_index(win, win).copy()).long(),
                persistent=False)

        def forward(self, xw, mask):
            b_, n, c = xw.shape
            d = c // self.n_heads
            qkv = self.qkv(xw).reshape(b_, n, 3, self.n_heads, d)
            qkv = qkv.permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q * d**-0.5) @ k.transpose(-2, -1)
            bias = self.relative_position_bias_table[self.rpi.view(-1)]
            attn = attn + bias.view(n, n, self.n_heads).permute(2, 0, 1)[None]
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.view(b_ // nw, nw, self.n_heads, n, n)
                attn = attn + mask[None, :, None]
                attn = attn.view(b_, self.n_heads, n, n)
            attn = torch.softmax(attn, dim=-1)
            return self.proj((attn @ v).transpose(1, 2).reshape(b_, n, c))

    class CABM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            mid = dim // compress
            att = dim // squeeze
            self.cab = nn.Sequential(
                nn.Conv2d(dim, mid, 3, padding=1), nn.Identity(),
                nn.Conv2d(mid, dim, 3, padding=1),
                nn.ModuleDict({"attention": nn.Sequential(
                    nn.Identity(), nn.Conv2d(dim, att, 1), nn.Identity(),
                    nn.Conv2d(att, dim, 1))}),
            )

        def forward(self, x):  # x: BHWC
            y = x.permute(0, 3, 1, 2)
            y = self.cab[2](F.gelu(self.cab[0](y)))
            a = y.mean(dim=(2, 3), keepdim=True)
            a = torch.sigmoid(
                self.cab[3]["attention"][3](F.relu(self.cab[3]["attention"][1](a))))
            return (y * a).permute(0, 2, 3, 1)

    class HABM(nn.Module):
        def __init__(self, n_heads: int, shift: int) -> None:
            super().__init__()
            self.shift = shift
            self.norm1 = nn.LayerNorm(dim, eps=1e-5)
            self.attn = AttnMirror(n_heads)
            self.conv_block = CABM()
            self.norm2 = nn.LayerNorm(dim, eps=1e-5)
            self.mlp = MlpM()

        def forward(self, x):
            b, h, w, c = x.shape
            shift = self.shift if min(h, w) > win else 0
            shortcut = x
            x = self.norm1(x)
            conv_x = self.conv_block(x)
            if shift > 0:
                sx = torch.roll(x, (-shift, -shift), dims=(1, 2))
                mask = torch.from_numpy(
                    shift_attn_mask(h, w, win, shift).copy()).to(x.dtype)
            else:
                sx, mask = x, None
            xw = sx.view(b, h // win, win, w // win, win, c)
            xw = xw.permute(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)
            xw = self.attn(xw, mask)
            sx = xw.view(b, h // win, w // win, win, win, c)
            sx = sx.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
            if shift > 0:
                sx = torch.roll(sx, (shift, shift), dims=(1, 2))
            x = shortcut + sx + conv_x * conv_scale
            return x + self.mlp(self.norm2(x))

    class OCABM(nn.Module):
        def __init__(self, n_heads: int) -> None:
            super().__init__()
            self.n_heads = n_heads
            self.norm1 = nn.LayerNorm(dim, eps=1e-5)
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.proj = nn.Linear(dim, dim)
            self.relative_position_bias_table = nn.Parameter(
                torch.zeros((win + wse - 1) ** 2, n_heads))
            self.register_buffer(
                "rpi", torch.from_numpy(rpi_oca(win, wse).copy()).long(),
                persistent=False)
            self.norm2 = nn.LayerNorm(dim, eps=1e-5)
            self.mlp = MlpM()

        def forward(self, x):
            b, h, w, c = x.shape
            pad = (wse - win) // 2
            d = c // self.n_heads
            shortcut = x
            x = self.norm1(x)
            qkv = self.qkv(x)
            q, kv = qkv[..., :c], qkv[..., c:]
            qw = q.view(b, h // win, win, w // win, win, c)
            qw = qw.permute(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)
            # overlapping kv windows at stride win from the padded map,
            # built from slices + reshapes + concat (same scheme as the
            # flax _overlap_windows; Tensor.unfold is not ONNX-exportable)
            kvp = F.pad(kv.permute(0, 3, 1, 2), (pad, pad, pad, pad))
            kvp = kvp.permute(0, 2, 3, 1)  # (b, Hp, Wp, 2c)
            nq_pieces = -(-wse // win)

            def expand(t, n_blocks, axis):
                need = (n_blocks + nq_pieces - 1) * win + win
                pad_amt = need - t.shape[axis]
                if pad_amt > 0:
                    zshape = list(t.shape)
                    zshape[axis] = pad_amt
                    t = torch.cat(
                        [t, torch.zeros(zshape, dtype=t.dtype)], dim=axis)
                pieces = []
                for qi in range(nq_pieces):
                    sl = [slice(None)] * t.ndim
                    sl[axis] = slice(qi * win, qi * win + n_blocks * win)
                    piece = t[tuple(sl)]
                    new_shape = list(piece.shape)
                    new_shape[axis: axis + 1] = [n_blocks, win]
                    pieces.append(piece.reshape(new_shape))
                out = torch.cat(pieces, dim=axis + 1)
                sl = [slice(None)] * out.ndim
                sl[axis + 1] = slice(0, wse)
                return out[tuple(sl)]

            t = expand(kvp, h // win, 1)       # (b, nh, wse, Wp, 2c)
            t = expand(t, w // win, 3)         # (b, nh, wse, nw, wse, 2c)
            kvw = t.permute(0, 1, 3, 2, 4, 5).reshape(-1, wse * wse, 2 * c)
            kw, vw = kvw[..., :c], kvw[..., c:]
            b_, nq, _ = qw.shape
            n = kw.shape[1]
            qh = qw.reshape(b_, nq, self.n_heads, d).permute(0, 2, 1, 3)
            kh = kw.reshape(b_, n, self.n_heads, d).permute(0, 2, 1, 3)
            vh = vw.reshape(b_, n, self.n_heads, d).permute(0, 2, 1, 3)
            attn = (qh * d**-0.5) @ kh.transpose(-2, -1)
            bias = self.relative_position_bias_table[self.rpi.view(-1)]
            attn = attn + bias.view(nq, n, self.n_heads).permute(2, 0, 1)[None]
            attn = torch.softmax(attn, dim=-1)
            out = (attn @ vh).transpose(1, 2).reshape(b_, nq, c)
            out = out.view(b, h // win, w // win, win, win, c)
            out = out.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
            x = self.proj(out) + shortcut
            return x + self.mlp(self.norm2(x))

    class RHAGM(nn.Module):
        def __init__(self, depth: int, n_heads: int) -> None:
            super().__init__()
            self.residual_group = nn.ModuleDict({
                "blocks": nn.ModuleList(
                    HABM(n_heads, 0 if j % 2 == 0 else win // 2)
                    for j in range(depth)),
                "overlap_attn": OCABM(n_heads),
            })
            self.conv = nn.Conv2d(dim, dim, 3, padding=1)

        def forward(self, x):
            res = x
            for blk in self.residual_group["blocks"]:
                x = blk(x)
            x = self.residual_group["overlap_attn"](x)
            x = self.conv(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            return x + res

    class HATMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.conv_first = nn.Conv2d(in_chans, dim, 3, padding=1)
            if patch_norm:
                self.patch_embed = nn.ModuleDict(
                    {"norm": nn.LayerNorm(dim, eps=1e-5)})
            self.layers = nn.ModuleList(
                RHAGM(d, h) for d, h in zip(depths, heads))
            self.norm = nn.LayerNorm(dim, eps=1e-5)
            self.conv_after_body = nn.Conv2d(dim, dim, 3, padding=1)
            self.conv_before_upsample = nn.Sequential(
                nn.Conv2d(dim, num_feat, 3, padding=1))
            ups: list[nn.Module] = []
            s = scale
            while s % 2 == 0 and s > 1:
                ups += [nn.Conv2d(num_feat, 4 * num_feat, 3, padding=1),
                        nn.PixelShuffle(2)]
                s //= 2
            if s == 3:
                ups += [nn.Conv2d(num_feat, 9 * num_feat, 3, padding=1),
                        nn.PixelShuffle(3)]
            self.upsample = nn.Sequential(*ups)
            self.conv_last = nn.Conv2d(num_feat, in_chans, 3, padding=1)

        def forward(self, x):
            mean = 0.5 if in_chans == 3 else 0.0
            x = (x - mean) * img_range
            feat = self.conv_first(x).permute(0, 2, 3, 1)
            h = feat
            if patch_norm:
                h = self.patch_embed["norm"](h)
            for layer in self.layers:
                h = layer(h)
            h = self.norm(h)
            h = self.conv_after_body(h.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            h = (h + feat).permute(0, 3, 1, 2)
            h = F.leaky_relu(self.conv_before_upsample[0](h), 0.01)
            out = self.conv_last(self.upsample(h))
            return out / img_range + mean

    return HATMirror()


def _atd_mirror(opt: dict[str, Any], scale: int):
    """Torch mirror of our flax ATD (archs/atd.py): shared-qkv SW-MSA +
    token-dictionary cross-attention (ATD-CA) + category-sorted grouped
    MSA (AC-MSA) + ConvFFN + per-block dictionary refinement."""
    import numpy as np_
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from neosr_tpu.archs.swin_util import (
        relative_position_index,
        shift_attn_mask,
    )

    dim = opt.get("embed_dim", 210)
    depths = list(opt.get("depths", (6,) * 6))
    heads = list(opt.get("num_heads", (6,) * len(depths)))
    win = opt.get("window_size", 16)
    category = opt.get("category_size", 256)
    num_tokens = opt.get("num_tokens", 128)
    rdim = opt.get("reducted_dim", 20)
    ffk = opt.get("convffn_kernel_size", 5)
    mlp_ratio = opt.get("mlp_ratio", 2.0)
    qkv_bias = opt.get("qkv_bias", True)
    patch_norm = opt.get("patch_norm", True)
    img_range = opt.get("img_range", 1.0)
    upsampler = opt.get("upsampler", "pixelshuffle")
    norm_in = opt.get("norm", False)
    in_chans = opt.get("in_chans", 3)
    num_feat = 64

    class AttnWin(nn.Module):  # W-MSA over precomputed qkv windows
        def __init__(self, n_heads: int) -> None:
            super().__init__()
            self.n_heads = n_heads
            self.proj = nn.Linear(dim, dim)
            self.relative_position_bias_table = nn.Parameter(
                torch.zeros((2 * win - 1) ** 2, n_heads))
            self.register_buffer(
                "rpi",
                torch.from_numpy(relative_position_index(win, win).copy()).long(),
                persistent=False)

        def forward(self, qkvw, mask):
            b_, n, c3 = qkvw.shape
            c = c3 // 3
            d = c // self.n_heads
            qkv = qkvw.reshape(b_, n, 3, self.n_heads, d).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q * d**-0.5) @ k.transpose(-2, -1)
            bias = self.relative_position_bias_table[self.rpi.view(-1)]
            attn = attn + bias.view(n, n, self.n_heads).permute(2, 0, 1)[None]
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.view(b_ // nw, nw, self.n_heads, n, n)
                attn = attn + mask[None, :, None]
                attn = attn.view(b_, self.n_heads, n, n)
            attn = torch.softmax(attn, dim=-1)
            return self.proj((attn @ v).transpose(1, 2).reshape(b_, n, c))

    class AttnATD(nn.Module):  # token-dictionary cross attention
        def __init__(self) -> None:
            super().__init__()
            self.wq = nn.Linear(dim, rdim, bias=qkv_bias)
            self.wk = nn.Linear(dim, rdim, bias=qkv_bias)
            self.wv = nn.Linear(dim, dim, bias=qkv_bias)
            self.scale = nn.Parameter(torch.full((num_tokens,), 0.5))

        def forward(self, tokens, td):
            q = self.wq(tokens)
            k = self.wk(td)
            v = self.wv(td)
            qn = q / (q.norm(dim=-1, keepdim=True) + 1e-12)
            kn = k / (k.norm(dim=-1, keepdim=True) + 1e-12)
            attn = qn @ kn.transpose(-2, -1)
            attn = attn * (1.0 + torch.clamp(self.scale, 0, 1)
                           * float(np_.log(num_tokens)))
            attn = torch.softmax(attn, dim=-1)
            return attn @ v, attn

    class AttnACA(nn.Module):  # category-sorted grouped MSA
        def __init__(self, n_heads: int) -> None:
            super().__init__()
            self.n_heads = n_heads
            self.proj = nn.Linear(dim, dim, bias=qkv_bias)
            self.logit_scale = nn.Parameter(
                torch.full((1, 1), float(np_.log(10.0))))

        def forward(self, qkv, sim):
            b, n, c3 = qkv.shape
            c = c3 // 3
            gs = min(n, category)
            ng = (n + gs - 1) // gs
            pad_n = ng * gs - n
            tk_id = sim.argmax(dim=-1)
            # stable sort via unique keys (tk_id*n + position): ONNX has no
            # stable Sort, but ties broken by position give the same order
            pos = torch.arange(n, device=sim.device)
            order = (tk_id * n + pos[None]).argsort(dim=-1)
            inverse = order.argsort(dim=-1)
            shuffled = torch.gather(
                qkv, 1, order.unsqueeze(-1).expand(-1, -1, c3))
            if pad_n:
                tail = shuffled[:, n - pad_n: n, :].flip(1)
                shuffled = torch.cat([shuffled, tail], dim=1)
            d = c // self.n_heads
            y = shuffled.reshape(b, ng, gs, 3, self.n_heads, d)
            y = y.permute(3, 0, 1, 4, 2, 5)
            q, k, v = y[0], y[1], y[2]
            ls = torch.exp(torch.clamp_max(
                self.logit_scale, float(np_.log(1.0 / 0.01))))
            attn = torch.softmax((q @ k.transpose(-2, -1)) * ls, dim=-1)
            out = (attn @ v).permute(0, 1, 3, 2, 4).reshape(b, ng * gs, c)
            out = out[:, :n, :]
            out = torch.gather(out, 1, inverse.unsqueeze(-1).expand(-1, -1, c))
            return self.proj(out)

    class ConvFFNM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            hidden = int(dim * mlp_ratio)
            self.fc1 = nn.Linear(dim, hidden)
            self.fc2 = nn.Linear(hidden, dim)
            self.dwconv = nn.ModuleDict({"depthwise_conv": nn.Sequential(
                nn.Conv2d(hidden, hidden, ffk, padding=(ffk - 1) // 2,
                          groups=hidden))})

        def forward(self, x):  # BHWC
            h = F.gelu(self.fc1(x))
            dw = self.dwconv["depthwise_conv"][0](
                h.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            return self.fc2(h + F.gelu(dw))

    class LayerM(nn.Module):
        def __init__(self, n_heads: int, shift: int, is_last: bool) -> None:
            super().__init__()
            self.shift, self.is_last = shift, is_last
            self.norm1 = nn.LayerNorm(dim, eps=1e-5)
            self.norm2 = nn.LayerNorm(dim, eps=1e-5)
            self.wqkv = nn.Linear(dim, 3 * dim, bias=qkv_bias)
            self.attn_win = AttnWin(n_heads)
            self.attn_atd = AttnATD()
            self.attn_aca = AttnACA(n_heads)
            self.convffn = ConvFFNM()
            if not is_last:
                self.sigma = nn.Parameter(torch.zeros(num_tokens, 1))
                self.norm3 = nn.InstanceNorm1d(num_tokens, affine=True)

        def forward(self, x, td):
            b, h, w, c = x.shape
            shift = self.shift if min(h, w) > win else 0
            n = h * w
            shortcut = x
            xl = self.norm1(x)
            tokens = xl.reshape(b, n, c)
            qkv = self.wqkv(tokens)
            x_atd, sim = self.attn_atd(tokens, td)
            x_aca = self.attn_aca(qkv, sim)
            qkv_sp = qkv.reshape(b, h, w, 3 * c)
            if shift > 0:
                qkv_sp = torch.roll(qkv_sp, (-shift, -shift), dims=(1, 2))
                mask = torch.from_numpy(
                    shift_attn_mask(h, w, win, shift).copy()).to(x.dtype)
            else:
                mask = None
            qw = qkv_sp.view(b, h // win, win, w // win, win, 3 * c)
            qw = qw.permute(0, 1, 3, 2, 4, 5).reshape(-1, win * win, 3 * c)
            aw = self.attn_win(qw, mask)
            x_win = aw.view(b, h // win, w // win, win, win, c)
            x_win = x_win.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
            if shift > 0:
                x_win = torch.roll(x_win, (shift, shift), dims=(1, 2))
            x = shortcut + x_win + (x_atd + x_aca).reshape(b, h, w, c)
            x = x + self.convffn(self.norm2(x))
            if not self.is_last:
                m = torch.softmax(
                    self.norm3(sim.transpose(1, 2).float()), dim=-1)
                s = torch.sigmoid(self.sigma)
                td = s * td + (1 - s) * (m.to(td.dtype) @ x.reshape(b, n, c))
            return x, td

    class ATDBM(nn.Module):
        def __init__(self, depth: int, n_heads: int) -> None:
            super().__init__()
            self.residual_group = nn.ModuleDict({"layers": nn.ModuleList(
                LayerM(n_heads, 0 if j % 2 == 0 else win // 2,
                       is_last=(j == depth - 1))
                for j in range(depth))})
            self.residual_group.td = nn.Parameter(
                torch.zeros(num_tokens, dim))
            self.conv = nn.Conv2d(dim, dim, 3, padding=1)

        def forward(self, x):
            b = x.shape[0]
            td = self.residual_group.td[None].expand(b, -1, -1).to(x.dtype)
            res = x
            for layer in self.residual_group["layers"]:
                x, td = layer(x, td)
            x = self.conv(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            return x + res

    class ATDMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.conv_first = nn.Conv2d(in_chans, dim, 3, padding=1)
            if patch_norm:
                self.patch_embed = nn.ModuleDict(
                    {"norm": nn.LayerNorm(dim, eps=1e-5)})
            self.layers = nn.ModuleList(
                ATDBM(d, h) for d, h in zip(depths, heads))
            self.norm = nn.LayerNorm(dim, eps=1e-5)
            self.conv_after_body = nn.Conv2d(dim, dim, 3, padding=1)
            if upsampler == "pixelshuffle":
                self.conv_before_upsample = nn.Sequential(
                    nn.Conv2d(dim, num_feat, 3, padding=1))
                ups: list[nn.Module] = []
                s = scale
                while s % 2 == 0 and s > 1:
                    ups += [nn.Conv2d(num_feat, 4 * num_feat, 3, padding=1),
                            nn.PixelShuffle(2)]
                    s //= 2
                if s == 3:
                    ups += [nn.Conv2d(num_feat, 9 * num_feat, 3, padding=1),
                            nn.PixelShuffle(3)]
                self.upsample = nn.Sequential(*ups)
                self.conv_last = nn.Conv2d(num_feat, in_chans, 3, padding=1)
            elif upsampler == "pixelshuffledirect":
                self.upsample = nn.Sequential(
                    nn.Conv2d(dim, in_chans * scale**2, 3, padding=1),
                    nn.PixelShuffle(scale))
            else:
                msg = f"atd ONNX mirror: unsupported upsampler {upsampler}"
                raise ValueError(msg)

        def forward(self, x):
            mean = 0.5 if in_chans == 3 else 0.0
            if norm_in:
                x = (x - mean) * img_range
            feat = self.conv_first(x).permute(0, 2, 3, 1)
            h = feat
            if patch_norm:
                h = self.patch_embed["norm"](h)
            for layer in self.layers:
                h = layer(h)
            h = self.norm(h)
            h = self.conv_after_body(
                h.permute(0, 3, 1, 2)).permute(0, 2, 3, 1) + feat
            h = h.permute(0, 3, 1, 2)
            if upsampler == "pixelshuffle":
                h = F.leaky_relu(self.conv_before_upsample[0](h), 0.01)
                out = self.conv_last(self.upsample(h))
            else:
                out = self.upsample(h)
            if norm_in:
                out = out / img_range + mean
            return out

    return ATDMirror()


def _drct_mirror(opt: dict[str, Any], scale: int):
    """Torch mirror of our flax DRCT (archs/drct.py): RDGs of 5 dense swin
    blocks with gc-growth adjust convs, 0.2 residual; pixelshuffle head."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from neosr_tpu.archs.swin_util import (
        relative_position_index,
        shift_attn_mask,
    )

    dim = opt.get("embed_dim", 180)
    depths = list(opt.get("depths", (6,) * 6))
    heads = list(opt.get("num_heads", (6,) * len(depths)))
    win = opt.get("window_size", 16)
    mlp_ratio = opt.get("mlp_ratio", 2.0)
    qkv_bias = opt.get("qkv_bias", True)
    gc = opt.get("gc", 32)
    patch_norm = opt.get("patch_norm", True)
    img_range = opt.get("img_range", 1.0)
    upsampler = opt.get("upsampler", "pixelshuffle")
    in_chans = opt.get("in_chans", 3)
    num_feat = 64

    class BlockM(nn.Module):  # swin block at arbitrary dim
        def __init__(self, d_in: int, base_heads: int, shift: int,
                     mlp: float) -> None:
            super().__init__()
            n_heads = base_heads - (d_in % base_heads) \
                if d_in % base_heads else base_heads
            self.n_heads, self.shift, self.d = n_heads, shift, d_in
            self.norm1 = nn.LayerNorm(d_in, eps=1e-5)
            self.norm2 = nn.LayerNorm(d_in, eps=1e-5)
            self.attn = nn.ModuleDict({
                "qkv": nn.Linear(d_in, d_in * 3, bias=qkv_bias),
                "proj": nn.Linear(d_in, d_in)})
            self.attn.relative_position_bias_table = nn.Parameter(
                torch.zeros((2 * win - 1) ** 2, n_heads))
            self.register_buffer(
                "rpi",
                torch.from_numpy(relative_position_index(win, win).copy()).long(),
                persistent=False)
            hidden = int(d_in * mlp)
            self.mlp = nn.ModuleDict({
                "fc1": nn.Linear(d_in, hidden), "fc2": nn.Linear(hidden, d_in)})

        def forward(self, x):
            b, h, w, c = x.shape
            shift = self.shift if min(h, w) > win else 0
            shortcut = x
            x = self.norm1(x)
            if shift > 0:
                x = torch.roll(x, (-shift, -shift), dims=(1, 2))
                mask = torch.from_numpy(
                    shift_attn_mask(h, w, win, shift).copy()).to(x.dtype)
            else:
                mask = None
            xw = x.view(b, h // win, win, w // win, win, c)
            xw = xw.permute(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)
            b_, n, _ = xw.shape
            d = c // self.n_heads
            qkv = self.attn["qkv"](xw).reshape(b_, n, 3, self.n_heads, d)
            qkv = qkv.permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q * d**-0.5) @ k.transpose(-2, -1)
            bias = self.attn.relative_position_bias_table[self.rpi.view(-1)]
            attn = attn + bias.view(n, n, self.n_heads).permute(2, 0, 1)[None]
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.view(b_ // nw, nw, self.n_heads, n, n)
                attn = attn + mask[None, :, None]
                attn = attn.view(b_, self.n_heads, n, n)
            attn = torch.softmax(attn, dim=-1)
            out = self.attn["proj"](
                (attn @ v).transpose(1, 2).reshape(b_, n, c))
            x = out.view(b, h // win, w // win, win, win, c)
            x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
            if shift > 0:
                x = torch.roll(x, (shift, shift), dims=(1, 2))
            x = shortcut + x
            y = F.gelu(self.mlp["fc1"](self.norm2(x)))
            return x + self.mlp["fc2"](y)

    class RDGM(nn.Module):
        def __init__(self, base_heads: int) -> None:
            super().__init__()
            dims = [dim, dim + gc, dim + 2 * gc, dim + 3 * gc, dim + 4 * gc]
            shifts = [0, win // 2, 0, win // 2, 0]
            mlps = [mlp_ratio, mlp_ratio, mlp_ratio, 1.0, 1.0]
            outs = [gc, gc, gc, gc, dim]
            for k in range(5):
                setattr(self, f"swin{k + 1}",
                        BlockM(dims[k], base_heads, shifts[k], mlps[k]))
                setattr(self, f"adjust{k + 1}",
                        nn.Conv2d(dims[k], outs[k], 1))

        def forward(self, x):
            def adj(conv, t, act=True):
                t = conv(t.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
                return F.leaky_relu(t, 0.2) if act else t

            x1 = adj(self.adjust1, self.swin1(x))
            x2 = adj(self.adjust2, self.swin2(torch.cat([x, x1], -1)))
            x3 = adj(self.adjust3, self.swin3(torch.cat([x, x1, x2], -1)))
            x4 = adj(self.adjust4, self.swin4(torch.cat([x, x1, x2, x3], -1)))
            x5 = adj(self.adjust5,
                     self.swin5(torch.cat([x, x1, x2, x3, x4], -1)), act=False)
            return x5 * 0.2 + x

    class DRCTMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.conv_first = nn.Conv2d(in_chans, dim, 3, padding=1)
            if patch_norm:
                self.patch_embed = nn.ModuleDict(
                    {"norm": nn.LayerNorm(dim, eps=1e-5)})
            self.layers = nn.ModuleList(RDGM(h) for h in heads)
            self.norm = nn.LayerNorm(dim, eps=1e-5)
            self.conv_after_body = nn.Conv2d(dim, dim, 3, padding=1)
            if upsampler == "pixelshuffle":
                self.conv_before_upsample = nn.Sequential(
                    nn.Conv2d(dim, num_feat, 3, padding=1))
                ups: list[nn.Module] = []
                s = scale
                while s % 2 == 0 and s > 1:
                    ups += [nn.Conv2d(num_feat, 4 * num_feat, 3, padding=1),
                            nn.PixelShuffle(2)]
                    s //= 2
                if s == 3:
                    ups += [nn.Conv2d(num_feat, 9 * num_feat, 3, padding=1),
                            nn.PixelShuffle(3)]
                self.upsample = nn.Sequential(*ups)
                self.conv_last = nn.Conv2d(num_feat, in_chans, 3, padding=1)
            else:
                self.upsample = nn.Sequential(
                    nn.Conv2d(dim, in_chans * scale**2, 3, padding=1),
                    nn.PixelShuffle(scale))

        def forward(self, x):
            mean = 0.5 if in_chans == 3 else 0.0
            x = (x - mean) * img_range
            feat = self.conv_first(x).permute(0, 2, 3, 1)
            h = feat
            if patch_norm:
                h = self.patch_embed["norm"](h)
            for layer in self.layers:
                h = layer(h)
            h = self.norm(h)
            h = self.conv_after_body(
                h.permute(0, 3, 1, 2)).permute(0, 2, 3, 1) + feat
            h = h.permute(0, 3, 1, 2)
            if upsampler == "pixelshuffle":
                h = F.leaky_relu(self.conv_before_upsample[0](h), 0.01)
                out = self.conv_last(self.upsample(h))
            else:
                out = self.upsample(h)
            return out / img_range + mean

    return DRCTMirror()


def _cugan_mirror(opt: dict[str, Any], scale: int):
    """Torch mirror of our flax Real-CUGAN (archs/cugan.py): cascaded
    U-Nets, VALID convs with explicit reflect pad / negative crops,
    SE gates, ConvTranspose upsampling, pro range mapping."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    pro = opt.get("pro", True)
    out_ch = opt.get("out_channels", 3)
    in_ch = opt.get("in_channels", 3)
    if scale not in (2, 3, 4):
        msg = "cugan ONNX mirror supports scale 2/3/4"
        raise ValueError(msg)

    def lrelu(t):
        return F.leaky_relu(t, 0.1)

    def crop(t, n):
        return t[:, :, n:-n, n:-n]

    class SEB(nn.Module):
        def __init__(self, c: int) -> None:
            super().__init__()
            self.conv1 = nn.Conv2d(c, c // 8, 1)
            self.conv2 = nn.Conv2d(c // 8, c, 1)

        def forward(self, x):
            g = x.mean(dim=(2, 3), keepdim=True)
            g = torch.sigmoid(self.conv2(F.relu(self.conv1(g))))
            return x * g

    class UC(nn.Module):
        def __init__(self, c_in: int, mid: int, c_out: int, se: bool) -> None:
            super().__init__()
            self.conv = nn.Sequential(
                nn.Conv2d(c_in, mid, 3), nn.Identity(),
                nn.Conv2d(mid, c_out, 3))
            if se:
                self.seblock = SEB(c_out)
            self.se = se

        def forward(self, x):
            x = lrelu(self.conv[2](lrelu(self.conv[0](x))))
            return self.seblock(x) if self.se else x

    u1_out = 64 if scale == 4 else out_ch

    class U1(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.conv1 = UC(in_ch, 32, 64, se=False)
            self.conv1_down = nn.Conv2d(64, 64, 2, stride=2)
            self.conv2 = UC(64, 128, 64, se=True)
            self.conv2_up = nn.ConvTranspose2d(64, 64, 2, stride=2)
            self.conv3 = nn.Conv2d(64, 64, 3)
            if scale == 3:
                self.conv_bottom = nn.ConvTranspose2d(64, u1_out, 5, stride=3)
            else:
                self.conv_bottom = nn.ConvTranspose2d(64, u1_out, 4, stride=2)

        def forward(self, x):
            x1 = self.conv1(x)
            x2 = lrelu(self.conv1_down(x1))
            x2 = lrelu(self.conv2_up(self.conv2(x2)))
            x3 = lrelu(self.conv3(crop(x1, 4) + x2))
            y = self.conv_bottom(x3)
            return crop(y, 2) if scale == 3 else crop(y, 3)

    class U2(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.conv1 = UC(u1_out, 32, 64, se=False)
            self.conv1_down = nn.Conv2d(64, 64, 2, stride=2)
            self.conv2 = UC(64, 64, 128, se=True)
            self.conv2_down = nn.Conv2d(128, 128, 2, stride=2)
            self.conv3 = UC(128, 256, 128, se=True)
            self.conv3_up = nn.ConvTranspose2d(128, 128, 2, stride=2)
            self.conv4 = UC(128, 64, 64, se=True)
            self.conv4_up = nn.ConvTranspose2d(64, 64, 2, stride=2)
            self.conv5 = nn.Conv2d(64, 64, 3)
            self.conv_bottom = nn.Conv2d(64, u1_out, 3)

        def forward(self, x):
            x1 = self.conv1(x)
            x2 = lrelu(self.conv1_down(x1))
            x2 = self.conv2(x2)
            x3 = lrelu(self.conv2_down(x2))
            x3 = lrelu(self.conv3_up(self.conv3(x3)))
            x4 = self.conv4(crop(x2, 4) + x3)
            x4 = lrelu(self.conv4_up(x4))
            x5 = lrelu(self.conv5(crop(x1, 16) + x4))
            return self.conv_bottom(x5)

    class CuganMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.unet1 = U1()
            self.unet2 = U2()
            if scale == 4:
                self.conv_final = nn.Conv2d(u1_out, 12, 3)

        def forward(self, x):
            x = torch.clamp(x, 0, 1)
            if pro:
                x = x * 0.7 + 0.15
            _, _, h0, w0 = x.shape
            x00 = x
            mod = 4 if scale == 3 else 2
            ph = ((h0 - 1) // mod + 1) * mod
            pw = ((w0 - 1) // mod + 1) * mod
            pad = {2: 18, 3: 14, 4: 19}[scale]
            x = F.pad(x, (pad, pad + pw - w0, pad, pad + ph - h0),
                      mode="reflect")
            u1 = self.unet1(x)
            u2 = self.unet2(u1)
            y = u2 + crop(u1, 20)
            if scale == 4:
                y = crop(self.conv_final(y), 1)
                y = F.pixel_shuffle(y, 2)
            y = y[:, :, : h0 * scale, : w0 * scale]
            if scale == 4:
                y = y + F.interpolate(x00, scale_factor=4, mode="nearest")
            if pro:
                y = (y - 0.15) / 0.7
            return y

    return CuganMirror()


def _safmn_mirror(opt: dict[str, Any], scale: int):
    """Torch mirror of our flax SAFMN (archs/safmn.py): SAFM multi-scale
    depthwise pyramid (adaptive max-pool levels) + CCM, pixel-shuffle."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    dim = opt.get("dim", 36)
    n_blocks = opt.get("n_blocks", 8)
    ffn_scale = opt.get("ffn_scale", 2.0)
    if opt.get("bcie", False):
        msg = "safmn ONNX mirror supports bcie=false only"
        raise ValueError(msg)
    n_levels = 4
    cd = dim // n_levels

    class SAFMM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.mfr = nn.ModuleList(
                nn.Conv2d(cd, cd, 3, padding=1, groups=cd)
                for _ in range(n_levels))
            self.aggr = nn.Conv2d(dim, dim, 1)

        def forward(self, x):
            # int() bakes the sizes at trace time: adaptive pool / resize
            # need constant targets for ONNX (static-size export, like the
            # transformer mirrors)
            h, w = int(x.shape[2]), int(x.shape[3])
            chunks = torch.chunk(x, n_levels, dim=1)
            outs = []
            for i, xc in enumerate(chunks):
                if i > 0:
                    # input sizes divisible by 2^(n_levels-1): adaptive max
                    # pool == plain max pool (ONNX has no adaptive pool)
                    s = F.max_pool2d(xc, kernel_size=2**i, stride=2**i)
                    s = self.mfr[i](s)
                    s = F.interpolate(s, scale_factor=2**i, mode="nearest")
                else:
                    s = self.mfr[i](xc)
                outs.append(s)
            return F.gelu(self.aggr(torch.cat(outs, dim=1))) * x

    class CCMM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            hidden = int(dim * ffn_scale)
            self.ccm = nn.Sequential(
                nn.Conv2d(dim, hidden, 3, padding=1), nn.Identity(),
                nn.Conv2d(hidden, dim, 1))

        def forward(self, x):
            return self.ccm[2](F.gelu(self.ccm[0](x)))

    class AttBlockM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.norm1 = nn.LayerNorm(dim, eps=1e-6)
            self.norm2 = nn.LayerNorm(dim, eps=1e-6)
            self.safm = SAFMM()
            self.ccm = CCMM()

        def forward(self, x):
            def ln(norm, t):  # channel-last LayerNorm on NCHW tensors
                return norm(t.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)

            x = self.safm(ln(self.norm1, x)) + x
            return self.ccm(ln(self.norm2, x)) + x

    class SafmnMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.to_feat = nn.Conv2d(3, dim, 3, padding=1)
            self.feats = nn.Sequential(*[AttBlockM() for _ in range(n_blocks)])
            self.to_img = nn.Sequential(
                nn.Conv2d(dim, 3 * scale**2, 3, padding=1),
                nn.PixelShuffle(scale))

        def forward(self, x):
            feat = self.to_feat(x)
            h = self.feats(feat) + feat
            return self.to_img(h)

    return SafmnMirror()


def _man_mirror(opt: dict[str, Any], scale: int):
    """Torch mirror of our flax MAN (archs/man.py): grouped large-kernel
    attention (3-scale dilated depthwise pyramid), SGAB gates, LKAT tail."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    feats = opt.get("n_feats", 180)
    n_resblocks = opt.get("n_resblocks", 36)
    n_resgroups = opt.get("n_resgroups", 1)
    n_colors = opt.get("n_colors", 3)

    def dw(c, k, d=1):
        return nn.Conv2d(c, c, k, padding=(k // 2) * d, dilation=d, groups=c)

    def ln(norm, t):
        return norm(t.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)

    class LKAM(nn.Module):  # GroupGLKA
        def __init__(self) -> None:
            super().__init__()
            c = feats // 3
            self.norm = nn.LayerNorm(feats, eps=1e-6)
            self.proj_first = nn.Sequential(nn.Conv2d(feats, feats * 2, 1))
            self.LKA3 = nn.Sequential(dw(c, 3), dw(c, 5, 2), nn.Conv2d(c, c, 1))
            self.X3 = dw(c, 3)
            self.LKA5 = nn.Sequential(dw(c, 5), dw(c, 7, 3), nn.Conv2d(c, c, 1))
            self.X5 = dw(c, 5)
            self.LKA7 = nn.Sequential(dw(c, 7), dw(c, 9, 4), nn.Conv2d(c, c, 1))
            self.X7 = dw(c, 7)
            self.proj_last = nn.Sequential(nn.Conv2d(feats, feats, 1))
            self.scale = nn.Parameter(torch.zeros(1, feats, 1, 1))

        def forward(self, x):
            shortcut = x
            x = ln(self.norm, x)
            x = self.proj_first[0](x)
            a, x = torch.chunk(x, 2, dim=1)
            a1, a2, a3 = torch.chunk(a, 3, dim=1)
            att = torch.cat([
                self.LKA3(a1) * self.X3(a1),
                self.LKA5(a2) * self.X5(a2),
                self.LKA7(a3) * self.X7(a3),
            ], dim=1)
            return self.proj_last[0](x * att) * self.scale + shortcut

    class LFEM(nn.Module):  # SGAB
        def __init__(self) -> None:
            super().__init__()
            self.norm = nn.LayerNorm(feats, eps=1e-6)
            self.Conv1 = nn.Conv2d(feats, feats * 2, 1)
            self.DWConv1 = dw(feats, 7)
            self.Conv2 = nn.Conv2d(feats, feats, 1)
            self.scale = nn.Parameter(torch.zeros(1, feats, 1, 1))

        def forward(self, x):
            shortcut = x
            x = self.Conv1(ln(self.norm, x))
            a, x = torch.chunk(x, 2, dim=1)
            x = self.Conv2(x * self.DWConv1(a))
            return x * self.scale + shortcut

    class LKATM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.conv0 = nn.Sequential(nn.Conv2d(feats, feats, 1))
            self.att = nn.Sequential(dw(feats, 7), dw(feats, 9, 3),
                                     nn.Conv2d(feats, feats, 1))
            self.conv1 = nn.Conv2d(feats, feats, 1)

        def forward(self, x):
            x = F.gelu(self.conv0[0](x))
            return self.conv1(x * self.att(x))

    class BlockPair(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.LKA = LKAM()
            self.LFE = LFEM()

        def forward(self, x):
            return self.LFE(self.LKA(x))

    class GroupM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.body = nn.ModuleList(BlockPair() for _ in range(n_resblocks))
            self.body_t = LKATM()

        def forward(self, x):
            res = x
            for blk in self.body:
                res = blk(res)
            return self.body_t(res) + x

    class ManMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.head = nn.Conv2d(n_colors, feats, 3, padding=1)
            self.body = nn.ModuleList(GroupM() for _ in range(n_resgroups))
            if n_resgroups > 1:
                self.body_t = nn.Conv2d(feats, feats, 3, padding=1)
            self.tail = nn.Sequential(
                nn.Conv2d(feats, n_colors * scale**2, 3, padding=1),
                nn.PixelShuffle(scale))

        def forward(self, x):
            x = self.head(x)
            res = x
            for g in self.body:
                res = g(res)
            if n_resgroups > 1:
                res = self.body_t(res) + x
            return self.tail(res)

    return ManMirror()


def _mosr_mirror(opt: dict[str, Any], scale: int):
    """Torch mirror of our flax MOSR (archs/mosr.py): gated CNN blocks with
    the `shortcut - 0.5` residual, ConvBlock skip, ps/gps/dys heads."""
    import torch
    import torch.nn as nn

    dim = opt.get("dim", 64)
    n_block = opt.get("n_block", 24)
    er = opt.get("expansion_ratio", 1.5)
    cr = opt.get("conv_ratio", 1.0)
    ksz = opt.get("kernel_size", 7)
    upsampler = opt.get("upsampler", "dys")
    in_ch = opt.get("in_ch", 3)
    out_ch = in_ch if upsampler == "ps" else opt.get("out_ch", 3)

    class GatedM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            hidden = int(er * dim)
            cc = int(cr * dim)
            self.hidden, self.cc = hidden, cc
            self.norm = nn.LayerNorm(dim, eps=1e-6)
            self.fc1 = nn.Conv2d(dim, hidden * 2, 3, padding=1)
            self.conv = nn.Conv2d(cc, cc, ksz, padding=ksz // 2, groups=cc)
            self.fc2 = nn.Conv2d(hidden, dim, 3, padding=1)

        def forward(self, x):
            shortcut = x
            x = self.norm(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
            x = self.fc1(x)
            g = x[:, : self.hidden]
            i = x[:, self.hidden: 2 * self.hidden - self.cc]
            c = self.conv(x[:, 2 * self.hidden - self.cc:])
            x = _mish(self.fc2(_mish(g) * torch.cat([i, c], dim=1)))
            return x + (shortcut - 0.5)

    class ConvBlockM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.block = nn.Sequential(
                nn.Conv2d(in_ch, dim, 3, padding=1), nn.Identity(),
                nn.Conv2d(dim, dim, 3, padding=1))
            self.conv11 = nn.Conv2d(in_ch, dim, 1)

        def forward(self, x):
            y = _mish(self.block[2](_mish(self.block[0](x))))
            return y + self.conv11(x)

    class MosrMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            mods: list[nn.Module] = [nn.Conv2d(in_ch, dim, 3, padding=1)]
            mods += [GatedM() for _ in range(n_block)]
            mods += [nn.Conv2d(dim, dim * 2, 3, padding=1), nn.Identity(),
                     nn.Conv2d(dim * 2, dim, 3, padding=1), nn.Identity(),
                     nn.Conv2d(dim, dim, 1)]
            self.gblocks = nn.Sequential(*mods)
            self.shortcut = ConvBlockM()
            if upsampler == "ps":
                self.upsampler = nn.Sequential(
                    nn.Conv2d(dim, out_ch * scale**2, 3, padding=1),
                    nn.PixelShuffle(scale))
            elif upsampler == "gps":
                self.upsampler = nn.ModuleDict({"in_to_k": nn.Conv2d(
                    dim, scale**2 * out_ch * 8, 3, padding=1)})
            elif upsampler == "dys":
                self.upsampler = _dysample_mirror(dim, out_ch, scale)
            else:
                msg = f"mosr ONNX mirror: unsupported upsampler {upsampler}"
                raise ValueError(msg)
            self.ups_kind = upsampler

        def forward(self, x):
            base = n_block + 1
            h = x
            for idx in range(base):
                h = self.gblocks[idx](h)
            h = _mish(self.gblocks[base](h))
            h = _mish(self.gblocks[base + 2](h))
            h = self.gblocks[base + 4](h)
            h = h + (self.shortcut(x) - 0.5)
            if self.ups_kind == "gps":
                k = self.upsampler["in_to_k"](h)
                b, c, hh, ww = k.shape
                k = k.view(b, 8, c // 8, hh, ww).mean(dim=1)
                import torch.nn.functional as F

                return F.pixel_shuffle(k, scale)
            return self.upsampler(h)

    return MosrMirror()


def _light_safmnpp_mirror(opt: dict[str, Any], scale: int):
    """Torch mirror of our flax light SAFMN++ (archs/safmn.py): SimpleSAFM
    (pooled gate at 1/8 resolution, bilinear re-expand) + CCM, bias-free."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    dim = opt.get("dim", 32)
    n_blocks = opt.get("n_blocks", 2)
    ffn_scale = opt.get("ffn_scale", 1.5)

    class SimpleM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.conv1 = nn.ModuleDict({
                "proj": nn.Conv2d(dim, dim, 3, padding=1, bias=False),
                "dwconv": nn.Conv2d(dim // 2, dim // 2, 3, padding=1,
                                    groups=dim // 2, bias=False),
                "out": nn.Conv2d(dim, dim, 1, bias=False)})
            self.conv2 = nn.ModuleDict({"conv": nn.Sequential(
                nn.Conv2d(dim, int(dim * ffn_scale), 3, padding=1, bias=False),
                nn.Identity(),
                nn.Conv2d(int(dim * ffn_scale), dim, 1, bias=False))})

        def forward(self, x):
            h, w = int(x.shape[2]), int(x.shape[3])
            proj = self.conv1["proj"](x)
            x0, x1 = torch.chunk(proj, 2, dim=1)
            # divisible sizes: adaptive max pool -> plain k8 max pool
            x2 = F.max_pool2d(x0, kernel_size=8, stride=8)
            x2 = self.conv1["dwconv"](x2)
            x2 = F.interpolate(x2, size=(h, w), mode="bilinear",
                               align_corners=False)
            x2 = F.gelu(x2) * x0
            out = self.conv1["out"](F.gelu(torch.cat([x1, x2], dim=1)))
            h2 = F.gelu(self.conv2["conv"][0](out))
            return self.conv2["conv"][2](h2)

    class LightMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.to_feat = nn.Conv2d(3, dim, 3, padding=1, bias=False)
            self.feats = nn.Sequential(*[SimpleM() for _ in range(n_blocks)])
            self.to_img = nn.Sequential(
                nn.Conv2d(dim, 3 * scale**2, 3, padding=1, bias=False),
                nn.PixelShuffle(scale))

        def forward(self, x):
            feat = self.to_feat(x)
            return self.to_img(self.feats(feat) + feat)

    return LightMirror()


def _srformer_mirror(opt: dict[str, Any], scale: int):
    """Torch mirror of our flax SRFormer (archs/srformer.py): permuted
    self-attention (2x-compressed kv), aligned rel-pos bias, ConvFFN."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from neosr_tpu.archs.srformer import psa_rel_index, psa_shift_mask

    dim = opt.get("embed_dim", 60)
    depths = list(opt.get("depths", (6, 6, 6, 6)))
    heads = list(opt.get("num_heads", (6,) * len(depths)))
    win = opt.get("window_size", 16)
    mlp_ratio = opt.get("mlp_ratio", 2.0)
    qkv_bias = opt.get("qkv_bias", True)
    patch_norm = opt.get("patch_norm", True)
    img_range = opt.get("img_range", 1.0)
    upsampler = opt.get("upsampler", "pixelshuffledirect")
    in_chans = opt.get("in_chans", 3)
    num_feat = 64
    pw = win // 2

    class PSAM(nn.Module):
        def __init__(self, n_heads: int) -> None:
            super().__init__()
            self.n_heads = n_heads
            self.kv = nn.Linear(dim, dim // 2, bias=qkv_bias)
            self.q = nn.Linear(dim, dim, bias=qkv_bias)
            self.proj = nn.Linear(dim, dim)
            self.relative_position_bias_table = nn.Parameter(
                torch.zeros((2 * pw - 1) ** 2, n_heads))
            self.register_buffer(
                "rpi", torch.from_numpy(psa_rel_index(pw).copy()).long(),
                persistent=False)

        def forward(self, xw, mask):
            b_, n, c = xw.shape
            d = c // self.n_heads
            kv = self.kv(xw).view(b_, pw, 2, pw, 2, 2, c // 4)
            kv = kv.permute(0, 1, 3, 5, 2, 4, 6)
            kv = kv.reshape(b_, n // 4, 2, self.n_heads, d).permute(2, 0, 3, 1, 4)
            k, v = kv[0], kv[1]
            q = self.q(xw).view(b_, n, self.n_heads, d).permute(0, 2, 1, 3)
            attn = (q * d**-0.5) @ k.transpose(-2, -1)
            bias = self.relative_position_bias_table[self.rpi.view(-1)]
            attn = attn + bias.view(n, n // 4, self.n_heads).permute(2, 0, 1)[None]
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.view(b_ // nw, nw, self.n_heads, n, n // 4)
                attn = attn + mask[None, :, None]
                attn = attn.view(b_, self.n_heads, n, n // 4)
            attn = torch.softmax(attn, dim=-1)
            return self.proj((attn @ v).transpose(1, 2).reshape(b_, n, c))

    class ConvFFNM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            hidden = int(dim * mlp_ratio)
            self.fc1 = nn.Linear(dim, hidden)
            self.fc2 = nn.Linear(hidden, dim)
            self.dwconv = nn.ModuleDict({"depthwise_conv": nn.Sequential(
                nn.Conv2d(hidden, hidden, 5, padding=2, groups=hidden))})

        def forward(self, x):  # BHWC
            h = F.gelu(self.fc1(x))
            dw = self.dwconv["depthwise_conv"][0](
                h.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            return self.fc2(h + F.gelu(dw))

    class PSABlockM(nn.Module):
        def __init__(self, n_heads: int, shift: int) -> None:
            super().__init__()
            self.shift = shift
            self.norm1 = nn.LayerNorm(dim, eps=1e-5)
            self.attn = PSAM(n_heads)
            self.norm2 = nn.LayerNorm(dim, eps=1e-5)
            self.mlp = ConvFFNM()

        def forward(self, x):
            b, h, w, c = x.shape
            shift = self.shift if min(h, w) > win else 0
            shortcut = x
            xl = self.norm1(x)
            if shift > 0:
                xl = torch.roll(xl, (-shift, -shift), dims=(1, 2))
                mask = torch.from_numpy(
                    psa_shift_mask(h, w, win, shift).copy()).to(x.dtype)
            else:
                mask = None
            xw = xl.view(b, h // win, win, w // win, win, c)
            xw = xw.permute(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)
            xw = self.attn(xw, mask)
            xl = xw.view(b, h // win, w // win, win, win, c)
            xl = xl.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
            if shift > 0:
                xl = torch.roll(xl, (shift, shift), dims=(1, 2))
            x = shortcut + xl
            return x + self.mlp(self.norm2(x))

    class GroupM(nn.Module):
        def __init__(self, depth: int, n_heads: int) -> None:
            super().__init__()
            self.residual_group = nn.ModuleDict({"blocks": nn.ModuleList(
                PSABlockM(n_heads, 0 if j % 2 == 0 else win // 2)
                for j in range(depth))})
            self.conv = nn.Conv2d(dim, dim, 3, padding=1)

        def forward(self, x):
            res = x
            for blk in self.residual_group["blocks"]:
                x = blk(x)
            x = self.conv(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            return x + res

    class SRFormerMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.conv_first = nn.Conv2d(in_chans, dim, 3, padding=1)
            if patch_norm:
                self.patch_embed = nn.ModuleDict(
                    {"norm": nn.LayerNorm(dim, eps=1e-5)})
            self.layers = nn.ModuleList(
                GroupM(d, h) for d, h in zip(depths, heads))
            self.norm = nn.LayerNorm(dim, eps=1e-5)
            self.conv_after_body = nn.Conv2d(dim, dim, 3, padding=1)
            if upsampler == "pixelshuffle":
                self.conv_before_upsample = nn.Sequential(
                    nn.Conv2d(dim, num_feat, 3, padding=1))
                ups: list[nn.Module] = []
                s = scale
                while s % 2 == 0 and s > 1:
                    ups += [nn.Conv2d(num_feat, 4 * num_feat, 3, padding=1),
                            nn.PixelShuffle(2)]
                    s //= 2
                if s == 3:
                    ups += [nn.Conv2d(num_feat, 9 * num_feat, 3, padding=1),
                            nn.PixelShuffle(3)]
                self.upsample = nn.Sequential(*ups)
                self.conv_last = nn.Conv2d(num_feat, in_chans, 3, padding=1)
            else:
                self.upsample = nn.Sequential(
                    nn.Conv2d(dim, in_chans * scale**2, 3, padding=1),
                    nn.PixelShuffle(scale))

        def forward(self, x):
            mean = 0.5 if in_chans == 3 else 0.0
            x = (x - mean) * img_range
            feat = self.conv_first(x).permute(0, 2, 3, 1)
            h = feat
            if patch_norm:
                h = self.patch_embed["norm"](h)
            for layer in self.layers:
                h = layer(h)
            h = self.norm(h)
            h = self.conv_after_body(
                h.permute(0, 3, 1, 2)).permute(0, 2, 3, 1) + feat
            h = h.permute(0, 3, 1, 2)
            if upsampler == "pixelshuffle":
                h = F.leaky_relu(self.conv_before_upsample[0](h), 0.01)
                out = self.conv_last(self.upsample(h))
            else:
                out = self.upsample(h)
            return out / img_range + mean

    return SRFormerMirror()


def _msdan_mirror(opt: dict[str, Any], scale: int):
    """Torch mirror of our flax MSDAN (archs/msdan.py): shared-conv EBFB
    gates, EMSSA multi-scale pooled attention (shared merge/gate conv),
    weight-shared x2 upsampler stages, plain-bicubic residual."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    ch = opt.get("channels", 28)
    n_dfeb = opt.get("num_DFEB", 8)
    if scale not in (2, 3, 4):
        msg = "msdan ONNX mirror supports scale 2/3/4"
        raise ValueError(msg)

    class BS(nn.Module):
        def __init__(self, c_in: int, c_out: int, k: int = 3) -> None:
            super().__init__()
            self.pw = nn.Conv2d(c_in, c_out, 1, bias=False)
            self.dw = nn.Conv2d(c_out, c_out, k, padding=k // 2, groups=c_out)

        def forward(self, x):
            return self.dw(self.pw(x))

    class EBFBM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.conv1 = nn.Conv2d(ch, ch, 1)
            self.BSConv3 = BS(ch, ch, 3)
            self.BSConv5 = BS(ch, ch, 5)
            self.BSConv7 = BS(ch, ch, 7)
            self.conv1_down = nn.Conv2d(4 * ch, ch, 1)

        def forward(self, x):
            x1 = self.conv1(x)
            x2 = torch.sigmoid(self.conv1(x)) * F.gelu(self.BSConv3(x))
            o1 = x1 + x2
            x3 = self.conv1(o1)
            x4 = torch.sigmoid(self.conv1(o1)) * F.gelu(self.BSConv5(o1))
            o2 = x3 + x4
            x5 = self.conv1(o2)
            x6 = torch.sigmoid(self.conv1(o2)) * F.gelu(self.BSConv7(o2))
            return self.conv1_down(torch.cat([x1, x3, x5, x6], dim=1))

    class EMSSAM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            c4 = ch // 4
            self.conv1 = nn.Conv2d(ch, ch, 1)
            self.conv1_down = nn.Conv2d(ch, c4, 1)
            self.conv1_mid = nn.Conv2d(c4, c4, 1)
            self.BSConv7 = BS(c4, c4, 7)
            self.BSConv5 = BS(c4, c4, 5)
            self.BSConv3 = BS(c4, c4, 3)
            self.conv1_up = nn.Conv2d(c4, ch, 1)

        def forward(self, x0):
            x = self.conv1_down(x0)
            outs = [self.conv1_mid(x)]
            for bs, factor in ((self.BSConv7, 2), (self.BSConv5, 4),
                               (self.BSConv3, 8)):
                s = F.max_pool2d(x, kernel_size=factor, stride=factor)
                s = bs(s)
                outs.append(F.interpolate(s, scale_factor=factor,
                                          mode="nearest"))
            merged = self.conv1(torch.cat(outs, dim=1)) + self.conv1_up(x)
            return x0 * torch.sigmoid(self.conv1(merged))

    class DFEBM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.EBFB = EBFBM()
            self.EMSSA = EMSSAM()

        def forward(self, x0):
            return self.EMSSA(self.EBFB(x0)) + x0

    class MsdanMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.BSConv_first = BS(3, ch, 3)
            self.layers = nn.ModuleList(DFEBM() for _ in range(n_dfeb))
            ups = nn.Module()
            if scale in (2, 4):
                ups.BSConv_2 = BS(ch, ch, 3)
                ups.BSConv1_2 = BS(ch // 4, ch, 3)
            else:
                ups.BSConv_3 = BS(ch, 54, 3)
                ups.BSConv1_3 = BS(6, ch, 3)
            self.upsampler = ups
            self.BSConv_last = BS(ch, 3, 3)

        def forward(self, x0):
            x1 = self.BSConv_first(x0)
            x = x1
            for layer in self.layers:
                x = layer(x)
            x = x + x1
            if scale in (2, 4):
                for _ in range(1 if scale == 2 else 2):
                    x = F.pixel_shuffle(self.upsampler.BSConv_2(x), 2)
                    x = F.gelu(self.upsampler.BSConv1_2(x))
            else:
                x = F.pixel_shuffle(self.upsampler.BSConv_3(x), 3)
                x = F.gelu(self.upsampler.BSConv1_3(x))
            up = F.interpolate(x0, scale_factor=scale, mode="bicubic",
                               align_corners=False)
            return up + self.BSConv_last(x)

    return MsdanMirror()


def _hitsrf_mirror(opt: dict[str, Any], scale: int):
    """Torch mirror of our flax HiT-SR (archs/hitsrf.py): DFE q/v split,
    spatial self-correlation against base-window-pooled v (learnable
    spatial linear + DynamicPosBias averaged over expansion groups),
    single-head channel correlation, post-norm, ConvFFN."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from neosr_tpu.archs.dat import rect_rel_coords

    dim = opt.get("embed_dim", 60)
    depths = list(opt.get("depths", (6, 6, 6, 6)))
    heads = list(opt.get("num_heads", (6,) * len(depths)))
    base_win = tuple(opt.get("base_win_size", (8, 8)))
    mlp_ratio = opt.get("mlp_ratio", 2.0)
    patch_norm = opt.get("patch_norm", True)
    img_range = opt.get("img_range", 1.0)
    upsampler = opt.get("upsampler", "pixelshuffledirect")
    ratios = list(opt.get("hier_win_ratios", (0.5, 1, 2, 4, 6, 8)))
    in_chans = opt.get("in_chans", 3)
    num_feat = 64
    win_hs = [int(base_win[0] * r) for r in ratios]
    win_ws = [int(base_win[1] * r) for r in ratios]

    class SCCM(nn.Module):
        def __init__(self, n_heads: int, wh: int, ww: int) -> None:
            super().__init__()
            self.n_heads, self.wh, self.ww = n_heads, wh, ww
            bh, bw = min(wh, base_win[0]), min(ww, base_win[1])
            self.bh, self.bw = bh, bw
            ratio = (wh * ww) // (bh * bw)
            self.qv = nn.ModuleDict({
                "conv": nn.Sequential(
                    nn.Conv2d(dim, dim // 5, 1), nn.Identity(),
                    nn.Conv2d(dim // 5, dim // 5, 3, padding=1), nn.Identity(),
                    nn.Conv2d(dim // 5, dim, 1)),
                "linear": nn.Conv2d(dim, dim, 1)})
            self.spatial_linear = nn.Linear(ratio, 1)
            pd = max(dim // 16, 1)
            pos = nn.Module()
            pos.pos_proj = nn.Linear(2, pd)
            pos.pos1 = nn.Sequential(nn.LayerNorm(pd), nn.Identity(),
                                     nn.Linear(pd, pd))
            pos.pos2 = nn.Sequential(nn.LayerNorm(pd), nn.Identity(),
                                     nn.Linear(pd, pd))
            pos.pos3 = nn.Sequential(nn.LayerNorm(pd), nn.Identity(),
                                     nn.Linear(pd, n_heads))
            self.pos = pos
            self.proj = nn.Linear(dim, dim)
            biases, idx = rect_rel_coords(wh, ww)
            self.register_buffer("biases", torch.from_numpy(biases.copy()),
                                 persistent=False)
            self.register_buffer("rpi", torch.from_numpy(idx.copy()).long(),
                                 persistent=False)

        def forward(self, x):  # BHWC, H,W multiples of window
            b, H, W, C = x.shape
            wh, ww, bh, bw = self.wh, self.ww, self.bh, self.bw
            hd = C // (2 * self.n_heads)
            nh = self.n_heads
            xc = x.permute(0, 3, 1, 2)
            conv = self.qv["conv"]
            hqv = F.leaky_relu(conv[0](xc), 0.2)
            hqv = F.leaky_relu(conv[2](hqv), 0.2)
            hqv = conv[4](hqv)
            qv = (hqv * self.qv["linear"](xc)).permute(0, 2, 3, 1)
            w_ = qv.view(b, H // wh, wh, W // ww, ww, C)
            w_ = w_.permute(0, 1, 3, 2, 4, 5).reshape(-1, wh * ww, C)
            b_, L, _ = w_.shape
            qv = w_.view(b_, L, 2, nh, hd).permute(2, 0, 3, 1, 4)
            q, v = qv[0], qv[1]
            ratio = L // (bh * bw)
            v_sp = v.reshape(b_, nh, bh, wh // bh, bw, ww // bw, hd)
            v_sp = v_sp.permute(0, 1, 2, 4, 6, 3, 5)
            v_sp = v_sp.reshape(b_, nh, bh * bw, hd, ratio)
            v_sp = self.spatial_linear(v_sp)[..., 0]
            corr = (q @ v_sp.transpose(-2, -1)) / float(hd)
            p = self.pos.pos_proj(self.biases)
            for n in (1, 2, 3):
                seq = getattr(self.pos, f"pos{n}")
                p = seq[2](F.relu(seq[0](p)))
            bias = p[self.rpi.view(-1)].view(L, L, nh)
            bias = bias.view(L, bh, wh // bh, bw, ww // bw, nh)
            bias = bias.permute(0, 1, 3, 5, 2, 4).reshape(L, bh * bw, nh, -1)
            bias = bias.mean(-1).permute(2, 0, 1)
            corr = corr + bias[None]
            x_sp = (corr @ v_sp).transpose(1, 2).reshape(b_, L, C // 2)
            qc = q.transpose(1, 2).reshape(b_, L, nh * hd)
            vc = v.transpose(1, 2).reshape(b_, L, nh * hd)
            cmap = (qc.transpose(-2, -1) @ vc) / float(L)
            x_ch = vc @ cmap.transpose(-2, -1)
            out = torch.cat([x_sp, x_ch], dim=-1)
            out = self.proj(out)
            out = out.view(b, H // wh, W // ww, wh, ww, C)
            return out.permute(0, 1, 3, 2, 4, 5).reshape(b, H, W, C)

    class ConvFFNM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            hidden = int(dim * mlp_ratio)
            self.fc1 = nn.Linear(dim, hidden)
            self.fc2 = nn.Linear(hidden, dim)
            self.dwconv = nn.ModuleDict({"depthwise_conv": nn.Sequential(
                nn.Conv2d(hidden, hidden, 5, padding=2, groups=hidden))})

        def forward(self, x):
            h = F.gelu(self.fc1(x))
            dw = self.dwconv["depthwise_conv"][0](
                h.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            return self.fc2(h + F.gelu(dw))

    class BlockM(nn.Module):
        def __init__(self, n_heads: int, wh: int, ww: int) -> None:
            super().__init__()
            self.correlation = SCCM(n_heads, wh, ww)
            self.norm1 = nn.LayerNorm(dim, eps=1e-5)
            self.norm2 = nn.LayerNorm(dim, eps=1e-5)
            self.mlp = ConvFFNM()

        def forward(self, x):
            shortcut = x
            y = self.norm1(self.correlation(x))  # post-norm
            x = shortcut + y
            return x + self.norm2(self.mlp(x))

    class HitSrfMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.conv_first = nn.Conv2d(in_chans, dim, 3, padding=1)
            if patch_norm:
                self.patch_embed = nn.ModuleDict(
                    {"norm": nn.LayerNorm(dim, eps=1e-5)})
            groups = []
            convs = []
            for gi, depth in enumerate(depths):
                blocks = nn.ModuleList(
                    BlockM(heads[gi],
                           win_hs[i % len(win_hs)], win_ws[i % len(win_ws)])
                    for i in range(depth))
                groups.append(nn.ModuleDict({"residual_group": nn.ModuleDict(
                    {"blocks": blocks})}))
                convs.append(nn.Conv2d(dim, dim, 3, padding=1))
            self.layers = nn.ModuleList(groups)
            for g, conv in enumerate(convs):
                self.layers[g].conv = conv
            self.norm = nn.LayerNorm(dim, eps=1e-5)
            self.conv_after_body = nn.Conv2d(dim, dim, 3, padding=1)
            if upsampler == "pixelshuffle":
                self.conv_before_upsample = nn.Sequential(
                    nn.Conv2d(dim, num_feat, 3, padding=1))
                ups: list[nn.Module] = []
                s = scale
                while s % 2 == 0 and s > 1:
                    ups += [nn.Conv2d(num_feat, 4 * num_feat, 3, padding=1),
                            nn.PixelShuffle(2)]
                    s //= 2
                if s == 3:
                    ups += [nn.Conv2d(num_feat, 9 * num_feat, 3, padding=1),
                            nn.PixelShuffle(3)]
                self.upsample = nn.Sequential(*ups)
                self.conv_last = nn.Conv2d(num_feat, in_chans, 3, padding=1)
            else:
                self.upsample = nn.Sequential(
                    nn.Conv2d(dim, in_chans * scale**2, 3, padding=1),
                    nn.PixelShuffle(scale))

        def forward(self, x):
            mean = 0.5 if in_chans == 3 else 0.0
            x = (x - mean) * img_range
            feat = self.conv_first(x).permute(0, 2, 3, 1)
            h = feat
            if patch_norm:
                h = self.patch_embed["norm"](h)
            for layer in self.layers:
                res = h
                for blk in layer["residual_group"]["blocks"]:
                    h = blk(h)
                h = layer.conv(h.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
                h = h + res
            h = self.norm(h)
            h = self.conv_after_body(
                h.permute(0, 3, 1, 2)).permute(0, 2, 3, 1) + feat
            h = h.permute(0, 3, 1, 2)
            if upsampler == "pixelshuffle":
                h = F.leaky_relu(self.conv_before_upsample[0](h), 0.01)
                out = self.conv_last(self.upsample(h))
            else:
                out = self.upsample(h)
            return out / img_range + mean

    return HitSrfMirror()


def _grformer_mirror(opt: dict[str, Any], scale: int):
    """Torch mirror of our flax GRFormer (archs/grformer.py): grouped
    residual q/k/v, cosine attention with clamped logit scale, ESRPB
    (16*sigmoid) bias MLP, rect windows, post-norm, dual-dw FFN."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from neosr_tpu.archs.dat import rect_shift_mask
    from neosr_tpu.archs.grformer import _esrpb_tables

    dim = opt.get("embed_dim", 60)
    depths = list(opt.get("depths", (6, 6, 6, 6)))
    heads = list(opt.get("num_heads", (3,) * len(depths)))
    wsz = tuple(opt.get("window_size", (8, 32)))
    mlp_ratio = opt.get("mlp_ratio", 2.0)
    img_range = opt.get("img_range", 1.0)
    in_chans = opt.get("in_chans", 3)

    class GRSAM(nn.Module):
        def __init__(self, n_heads: int, win: tuple[int, int]) -> None:
            super().__init__()
            half = dim // 2
            self.n_heads = n_heads
            for nm in ("q1", "q2", "k1", "k2", "v1", "v2"):
                setattr(self, nm, nn.Linear(half, half))
            self.logit_scale = nn.Parameter(
                torch.full((n_heads, 1, 1), float(np.log(10.0))))
            self.ESRPB_MLP = nn.Sequential(
                nn.Linear(2, 128), nn.Identity(), nn.Linear(128, n_heads, bias=False))
            self.proj1 = nn.Linear(half, half)
            self.proj2 = nn.Linear(half, half)
            table, idx = _esrpb_tables(*win)
            self.register_buffer("table", torch.from_numpy(table.copy()),
                                 persistent=False)
            self.register_buffer("rpi", torch.from_numpy(idx.copy()).long(),
                                 persistent=False)

        def forward(self, xw, mask):
            b_, n, c = xw.shape
            half = c // 2
            d = c // self.n_heads

            def grl(l1, l2, t):
                a = t[..., :half] + l1(t[..., :half])
                b2 = t[..., half:] + l2(t[..., half:])
                return torch.stack([a, b2], dim=2).reshape(b_, n, c)

            def split_heads(t):
                return t.view(b_, n, self.n_heads, d).permute(0, 2, 1, 3)

            q = split_heads(grl(self.q1, self.q2, xw))
            k = split_heads(grl(self.k1, self.k2, xw))
            v = split_heads(grl(self.v1, self.v2, xw))
            q = q / (q.norm(dim=-1, keepdim=True) + 1e-12)
            k = k / (k.norm(dim=-1, keepdim=True) + 1e-12)
            attn = q @ k.transpose(-2, -1)
            attn = attn * torch.exp(torch.clamp_max(
                self.logit_scale, float(np.log(1.0 / 0.01))))
            h1 = F.relu(self.ESRPB_MLP[0](self.table))
            bias_tab = self.ESRPB_MLP[2](h1)
            bias = bias_tab[self.rpi.view(-1)].view(n, n, self.n_heads)
            attn = attn + 16.0 * torch.sigmoid(bias.permute(2, 0, 1))[None]
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.view(b_ // nw, nw, self.n_heads, n, n)
                attn = attn + mask[None, :, None]
                attn = attn.view(b_, self.n_heads, n, n)
            attn = torch.softmax(attn, dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(b_, n, c)
            o = torch.stack([self.proj1(out[..., :half]),
                             self.proj2(out[..., half:])], dim=2)
            return o.reshape(b_, n, c)

    class BlockM(nn.Module):
        def __init__(self, n_heads: int, shift: tuple[int, int],
                     win: tuple[int, int]) -> None:
            super().__init__()
            self.shift = shift
            self.win = win
            self.attn = GRSAM(n_heads, win)
            self.norm1 = nn.LayerNorm(dim, eps=1e-5)
            self.norm2 = nn.LayerNorm(dim, eps=1e-5)
            hidden = int(dim * mlp_ratio)
            self.mlp = nn.ModuleDict({
                "fc1": nn.Linear(dim, hidden), "fc2": nn.Linear(hidden, dim),
                "dwconv": nn.ModuleDict({"depthwise_conv": nn.Sequential(
                    nn.Conv2d(hidden, hidden, 3, padding=1, groups=hidden),
                    nn.Identity(),
                    nn.Conv2d(hidden, hidden, 3, padding=1, groups=hidden))})})

        def forward(self, x):
            b, h, w, c = x.shape
            hs, ws = self.win
            sh, sw = self.shift
            if h < hs or w < ws:
                hs, ws = min(h, hs), min(w, ws)
                sh = sw = 0
            shortcut = x
            if sh > 0:
                xs = torch.roll(x, (-sh, -sw), dims=(1, 2))
                mask = torch.from_numpy(
                    rect_shift_mask(h, w, hs, ws, sh, sw).copy()).to(x.dtype)
            else:
                xs, mask = x, None
            xw = xs.view(b, h // hs, hs, w // ws, ws, c)
            xw = xw.permute(0, 1, 3, 2, 4, 5).reshape(-1, hs * ws, c)
            xw = self.attn(xw, mask)
            xs = xw.view(b, h // hs, w // ws, hs, ws, c)
            xs = xs.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
            if sh > 0:
                xs = torch.roll(xs, (sh, sw), dims=(1, 2))
            x = shortcut + self.norm1(xs)
            y = F.gelu(self.mlp["fc1"](x))
            seq = self.mlp["dwconv"]["depthwise_conv"]
            dw = seq[0](y.permute(0, 3, 1, 2))
            dw = seq[2](F.gelu(dw)).permute(0, 2, 3, 1)
            y = self.mlp["fc2"](y + dw)
            return x + self.norm2(y)

    class GRFormerMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.conv_first = nn.Conv2d(in_chans, dim, 3, padding=1)
            groups = []
            for gi, depth in enumerate(depths):
                blocks = nn.ModuleList(
                    BlockM(heads[gi],
                           (0, 0) if i % 2 == 0 else (wsz[0] // 2, wsz[1] // 2),
                           wsz if (i // 2) % 2 == 0 else (wsz[1], wsz[0]))
                    for i in range(depth))
                g = nn.ModuleDict({"blocks": blocks})
                g.conv = nn.Conv2d(dim, dim, 3, padding=1)
                groups.append(g)
            self.layers = nn.ModuleList(groups)
            self.norm = nn.LayerNorm(dim, eps=1e-5)
            self.conv_after_body = nn.Conv2d(dim, dim, 3, padding=1)
            self.upsample = nn.Sequential(
                nn.Conv2d(dim, in_chans * scale**2, 3, padding=1),
                nn.PixelShuffle(scale))

        def forward(self, x):
            mean = 0.5 if in_chans == 3 else 0.0
            b, _, H0, W0 = x.shape
            ms = max(wsz)
            ph, pw = (-int(H0)) % ms, (-int(W0)) % ms
            if ph or pw:
                x = F.pad(x, (0, pw, 0, ph), mode="reflect")
            x = (x - mean) * img_range
            feat = self.conv_first(x).permute(0, 2, 3, 1)
            h = feat
            for layer in self.layers:
                for blk in layer["blocks"]:
                    h = blk(h)
                h = h + layer.conv(h.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            h = self.norm(h)
            h = self.conv_after_body(
                h.permute(0, 3, 1, 2)).permute(0, 2, 3, 1) + feat
            out = self.upsample(h.permute(0, 3, 1, 2))
            out = out / img_range + mean
            return out[:, :, : H0 * scale, : W0 * scale]

    return GRFormerMirror()


def _rgt_mirror(opt: dict[str, Any], scale: int):
    """Torch mirror of our flax RGT (archs/rgt.py): alternating L_SA (dual
    rect windows + DynamicPosBias + LePE) and RG_SA (recursive shared-conv
    4x reduction, eval-rule depth), SGFN, HAI gamma."""
    import math as _math

    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from neosr_tpu.archs.dat import rect_rel_coords, rect_shift_mask

    dim = opt.get("embed_dim", 180)
    depth = list(opt.get("depth", (6,) * 8))
    heads = list(opt.get("num_heads", (6,) * len(depth)))
    mlp_ratio = opt.get("mlp_ratio", 2.0)
    qkv_bias = opt.get("qkv_bias", True)
    split = tuple(opt.get("split_size", (8, 32)))
    c_ratio = opt.get("c_ratio", 0.5)
    img_range = opt.get("img_range", 1.0)
    in_chans = opt.get("in_chans", 3)
    num_feat = 64

    class DPB(nn.Module):
        def __init__(self, branch_dim: int, n_heads: int) -> None:
            super().__init__()
            pd = max(branch_dim // 16, 1)
            self.pos_proj = nn.Linear(2, pd)
            self.pos1 = nn.Sequential(nn.LayerNorm(pd), nn.Identity(),
                                      nn.Linear(pd, pd))
            self.pos2 = nn.Sequential(nn.LayerNorm(pd), nn.Identity(),
                                      nn.Linear(pd, pd))
            self.pos3 = nn.Sequential(nn.LayerNorm(pd), nn.Identity(),
                                      nn.Linear(pd, n_heads))

        def forward(self, b):
            h = self.pos_proj(b)
            for seq in (self.pos1, self.pos2, self.pos3):
                h = seq[2](F.relu(seq[0](h)))
            return h

    class Branch(nn.Module):  # SpatialAttentionBranch
        def __init__(self, bdim: int, hs: int, ws: int, n_heads: int) -> None:
            super().__init__()
            self.bdim, self.hs, self.ws, self.n_heads = bdim, hs, ws, n_heads
            self.pos = DPB(bdim, n_heads)
            biases, idx = rect_rel_coords(hs, ws)
            self.register_buffer("biases", torch.from_numpy(biases.copy()),
                                 persistent=False)
            self.register_buffer("rpi", torch.from_numpy(idx.copy()).long(),
                                 persistent=False)

        def forward(self, qkv_sp, mask):
            b, h, w, _ = qkv_sp.shape
            hs, ws, nh = self.hs, self.ws, self.n_heads
            d = self.bdim // nh
            win = qkv_sp.view(b, h // hs, hs, w // ws, ws, 3 * self.bdim)
            win = win.permute(0, 1, 3, 2, 4, 5).reshape(-1, hs * ws, 3 * self.bdim)
            b_, n, _ = win.shape
            qkv = win.view(b_, n, 3, nh, d).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            pos = self.pos(self.biases)
            bias = pos[self.rpi.view(-1)].view(n, n, nh).permute(2, 0, 1)
            attn = (q * d**-0.5) @ k.transpose(-2, -1) + bias[None]
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.view(b_ // nw, nw, nh, n, n)
                attn = attn + mask[None, :, None]
                attn = attn.view(b_, nh, n, n)
            attn = torch.softmax(attn, dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(b_, n, self.bdim)
            out = out.view(b, h // hs, w // ws, hs, ws, self.bdim)
            return out.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, self.bdim)

    class LSAM(nn.Module):
        def __init__(self, n_heads: int, shift: bool) -> None:
            super().__init__()
            self.shift = shift
            self.n_heads = n_heads
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.attns = nn.ModuleList([
                Branch(dim // 2, split[0], split[1], n_heads // 2),
                Branch(dim // 2, split[1], split[0], n_heads // 2)])
            self.get_v = nn.Conv2d(dim, dim, 3, padding=1, groups=dim)
            self.proj = nn.Linear(dim, dim)

        def forward(self, x):  # BHWC
            b, h, w, c = x.shape
            s0, s1 = split
            sh, sw = s0 // 2, s1 // 2
            qkv = self.qkv(x)
            v_img = qkv[..., 2 * c:]
            ms = max(s0, s1)
            pad_b, pad_r = (-h) % ms, (-w) % ms
            qkv_p = F.pad(qkv.permute(0, 3, 1, 2), (0, pad_r, 0, pad_b))
            qkv_p = qkv_p.permute(0, 2, 3, 1)
            hp, wp = h + pad_b, w + pad_r
            half = c // 2

            def split_qkv(t, lo, hi):
                return torch.cat([t[..., lo:hi], t[..., c + lo: c + hi],
                                  t[..., 2 * c + lo: 2 * c + hi]], dim=-1)

            qkv0 = split_qkv(qkv_p, 0, half)
            qkv1 = split_qkv(qkv_p, half, c)
            if self.shift and min(hp, wp) > ms:
                qkv0 = torch.roll(qkv0, (-sh, -sw), dims=(1, 2))
                qkv1 = torch.roll(qkv1, (-sw, -sh), dims=(1, 2))
                m0 = torch.from_numpy(
                    rect_shift_mask(hp, wp, s0, s1, sh, sw).copy()).to(x.dtype)
                m1 = torch.from_numpy(
                    rect_shift_mask(hp, wp, s1, s0, sw, sh).copy()).to(x.dtype)
                x0 = self.attns[0](qkv0, m0)
                x1 = self.attns[1](qkv1, m1)
                x0 = torch.roll(x0, (sh, sw), dims=(1, 2))
                x1 = torch.roll(x1, (sw, sh), dims=(1, 2))
            else:
                x0 = self.attns[0](qkv0, None)
                x1 = self.attns[1](qkv1, None)
            att = torch.cat([x0, x1], dim=-1)[:, :h, :w, :]
            lcm = self.get_v(v_img.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            return self.proj(att + lcm)

    class RGSAM(nn.Module):
        def __init__(self, n_heads: int) -> None:
            super().__init__()
            self.n_heads = n_heads
            cr = int(dim * c_ratio)
            self.cr = cr
            self.reduction1 = nn.Conv2d(dim, dim, 4, stride=4, groups=dim)
            self.dwconv = nn.Conv2d(dim, dim, 3, padding=1, groups=dim)
            self.conv = nn.Conv2d(dim, cr, 1)
            self.norm_act = nn.Sequential(nn.LayerNorm(cr), nn.Identity())
            self.q = nn.Linear(dim, cr, bias=qkv_bias)
            self.k = nn.Linear(cr, cr, bias=qkv_bias)
            self.v = nn.Linear(cr, dim, bias=qkv_bias)
            self.cpe = nn.Conv2d(dim, dim, 3, padding=1, groups=dim)
            self.proj = nn.Linear(dim, dim)

        def forward(self, x):  # BHWC, eval-rule recursion depth
            b, h, w, c = x.shape
            cr = self.cr
            nh = self.n_heads
            d_cr, d = cr // nh, c // nh
            scl = (d * c_ratio) ** -0.5
            _time = max(int(_math.log(max(h // 16, 1), 4)),
                        int(_math.log(max(w // 16, 1), 4)), 2)
            red = x.permute(0, 3, 1, 2)
            for _ in range(_time):
                if min(red.shape[2], red.shape[3]) < 4:
                    break
                red = self.reduction1(red)
            red = self.conv(self.dwconv(red))
            hr, wr = red.shape[2], red.shape[3]
            red_tokens = red.permute(0, 2, 3, 1).reshape(b, hr * wr, cr)
            red_tokens = F.gelu(self.norm_act[0](red_tokens))
            n = h * w
            tokens = x.reshape(b, n, c)
            q = self.q(tokens).view(b, n, nh, d_cr).permute(0, 2, 1, 3)
            k = self.k(red_tokens).view(b, -1, nh, d_cr).permute(0, 2, 1, 3)
            v = self.v(red_tokens).view(b, -1, nh, d).permute(0, 2, 1, 3)
            attn = torch.softmax((q * scl) @ k.transpose(-2, -1), dim=-1)
            v_img = v.transpose(1, 2).reshape(b, hr, wr, c).permute(0, 3, 1, 2)
            cpe = self.cpe(v_img).permute(0, 2, 3, 1)
            v = v + cpe.reshape(b, -1, nh, d).permute(0, 2, 1, 3)
            out = (attn @ v).transpose(1, 2).reshape(b, h, w, c)
            return self.proj(out)

    class SGFNM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            hidden = int(dim * mlp_ratio)
            self.fc1 = nn.Linear(dim, hidden)
            self.sg = nn.ModuleDict({})
            self.sg.norm = nn.LayerNorm(hidden // 2)
            self.sg.conv = nn.Conv2d(hidden // 2, hidden // 2, 3, padding=1,
                                     groups=hidden // 2)
            self.fc2 = nn.Linear(hidden // 2, dim)

        def forward(self, x):  # BHWC
            h = F.gelu(self.fc1(x))
            x1, x2 = torch.chunk(h, 2, dim=-1)
            x2 = self.sg.norm(x2)
            x2 = self.sg.conv(x2.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            return self.fc2(x1 * x2)

    class BlockM(nn.Module):
        def __init__(self, n_heads: int, rg: int, bi: int) -> None:
            super().__init__()
            self.norm1 = nn.LayerNorm(dim, eps=1e-5)
            self.norm2 = nn.LayerNorm(dim, eps=1e-5)
            if bi % 2 == 0:
                shift = (rg % 2 == 0 and bi > 0 and (bi - 2) % 4 == 0) or (
                    rg % 2 != 0 and bi % 4 == 0)
                self.attn = LSAM(n_heads, shift)
            else:
                self.attn = RGSAM(n_heads)
            self.mlp = SGFNM()
            self.gamma = nn.Parameter(torch.full((dim,), 1e-4))

        def forward(self, x):
            res = x
            x = x + self.attn(self.norm1(x))
            x = x + self.mlp(self.norm2(x))
            return x + res * self.gamma

    class RGTMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.conv_first = nn.Conv2d(in_chans, dim, 3, padding=1)
            self.before_RG = nn.Sequential(
                nn.Identity(), nn.LayerNorm(dim, eps=1e-5))
            groups = []
            for rg, dep in enumerate(depth):
                g = nn.ModuleDict({"blocks": nn.ModuleList(
                    BlockM(heads[rg], rg, i) for i in range(dep))})
                g.conv = nn.Conv2d(dim, dim, 3, padding=1)
                groups.append(g)
            self.layers = nn.ModuleList(groups)
            self.norm = nn.LayerNorm(dim, eps=1e-5)
            self.conv_after_body = nn.Conv2d(dim, dim, 3, padding=1)
            self.conv_before_upsample = nn.Sequential(
                nn.Conv2d(dim, num_feat, 3, padding=1))
            ups: list[nn.Module] = []
            s = scale
            while s % 2 == 0 and s > 1:
                ups += [nn.Conv2d(num_feat, 4 * num_feat, 3, padding=1),
                        nn.PixelShuffle(2)]
                s //= 2
            if s == 3:
                ups += [nn.Conv2d(num_feat, 9 * num_feat, 3, padding=1),
                        nn.PixelShuffle(3)]
            self.upsample = nn.Sequential(*ups)
            self.conv_last = nn.Conv2d(num_feat, in_chans, 3, padding=1)

        def forward(self, x):
            mean = 0.5 if in_chans == 3 else 0.0
            x = (x - mean) * img_range
            feat = self.conv_first(x).permute(0, 2, 3, 1)
            h = self.before_RG[1](feat)
            for layer in self.layers:
                res = h
                for blk in layer["blocks"]:
                    h = blk(h)
                h = layer.conv(h.permute(0, 3, 1, 2)).permute(0, 2, 3, 1) + res
            h = self.norm(h)
            h = self.conv_after_body(
                h.permute(0, 3, 1, 2)).permute(0, 2, 3, 1) + feat
            h = h.permute(0, 3, 1, 2)
            h = F.leaky_relu(self.conv_before_upsample[0](h), 0.01)
            out = self.conv_last(self.upsample(h))
            return out / img_range + mean

    return RGTMirror()


def _omnisr_mirror(opt: dict[str, Any], scale: int):
    """Torch mirror of our flax OmniSR (archs/omnisr.py): MBConv + block/
    grid window attention (Embedding rel bias) + gated conv FFN + block/
    grid channel attention + ESA, zero-pad to window multiples."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from neosr_tpu.archs.omnisr import _rel_idx

    dim = opt.get("num_feat", 64)
    res_num = opt.get("res_num", 5)
    block_num = opt.get("block_num", 1)
    win = opt.get("window_size", 8)
    with_pe = opt.get("pe", True)
    in_ch = opt.get("num_in_ch", 3)
    out_ch = opt.get("num_out_ch", 3)

    class MBConvM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            fn = nn.Module()
            fn.add_module("0", nn.Conv2d(dim, dim, 1))
            fn.add_module("2", nn.Conv2d(dim, dim, 3, padding=1, groups=dim))
            gate_holder = nn.Module()
            gate = nn.Module()
            gate.add_module("1", nn.Linear(dim, dim // 4, bias=False))
            gate.add_module("3", nn.Linear(dim // 4, dim, bias=False))
            gate_holder.gate = gate
            fn.add_module("4", gate_holder)
            fn.add_module("5", nn.Conv2d(dim, dim, 1))
            self.fn = fn

        def forward(self, x):  # BHWC
            h = x.permute(0, 3, 1, 2)
            h = F.gelu(getattr(self.fn, "0")(h))
            h = F.gelu(getattr(self.fn, "2")(h))
            g = h.mean(dim=(2, 3))
            gate = getattr(self.fn, "4").gate
            g = torch.sigmoid(getattr(gate, "3")(
                F.silu(getattr(gate, "1")(g))))
            h = h * g[:, :, None, None]
            h = getattr(self.fn, "5")(h).permute(0, 2, 3, 1)
            return h + x

    class AttnM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            heads = 4
            fn = nn.Module()
            fn.to_qkv = nn.Linear(dim, dim * 3, bias=False)
            out_holder = nn.Module()
            out_holder.add_module("0", nn.Linear(dim, dim, bias=False))
            fn.to_out = out_holder
            if with_pe:
                fn.rel_pos_bias = nn.Embedding((2 * win - 1) ** 2, heads)
            self.fn = fn
            self.register_buffer(
                "rpi", torch.from_numpy(_rel_idx(win).copy()).long(),
                persistent=False)

        def forward(self, xw):  # (B', n, c) pre-normed
            b_, n, c = xw.shape
            heads = 4
            d = dim // 4
            qkv = self.fn.to_qkv(xw).view(b_, n, 3, heads, d).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q * d**-0.5) @ k.transpose(-2, -1)
            if with_pe:
                bias = self.fn.rel_pos_bias.weight[self.rpi.view(-1)]
                attn = attn + bias.view(n, n, heads).permute(2, 0, 1)[None]
            attn = torch.softmax(attn, dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(b_, n, c)
            return getattr(self.fn.to_out, "0")(out)

    class FFNM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            fn = nn.Module()
            fn.project_in = nn.Conv2d(dim, dim * 2, 1, bias=False)
            fn.dwconv = nn.Conv2d(dim * 2, dim * 2, 3, padding=1,
                                  groups=dim * 2, bias=False)
            fn.project_out = nn.Conv2d(dim, dim, 1, bias=False)
            self.fn = fn

        def forward(self, x):  # BHWC
            h = self.fn.dwconv(self.fn.project_in(x.permute(0, 3, 1, 2)))
            x1, x2 = torch.chunk(h, 2, dim=1)
            return self.fn.project_out(F.gelu(x1) * x2).permute(0, 2, 3, 1)

    class ChanM(nn.Module):
        def __init__(self, grid: bool) -> None:
            super().__init__()
            self.grid = grid
            fn = nn.Module()
            fn.temperature = nn.Parameter(torch.ones(4, 1, 1))
            fn.qkv = nn.Conv2d(dim, dim * 3, 1, bias=False)
            fn.qkv_dwconv = nn.Conv2d(dim * 3, dim * 3, 3, padding=1,
                                      groups=dim * 3, bias=False)
            fn.project_out = nn.Conv2d(dim, dim, 1, bias=False)
            self.fn = fn

        def forward(self, x):  # BHWC
            b, h, w, c = x.shape
            ps = win
            heads = 4
            d = c // heads
            qkv = self.fn.qkv_dwconv(self.fn.qkv(x.permute(0, 3, 1, 2)))
            qkv = qkv.permute(0, 2, 3, 1)  # BHW(3c)
            t = qkv.view(b, h // ps, ps, w // ps, ps, 3, heads, d)
            if self.grid:
                t = t.permute(5, 0, 2, 4, 6, 7, 1, 3)
                t = t.reshape(3, b * ps * ps, heads, d, -1)
            else:
                t = t.permute(5, 0, 1, 3, 6, 7, 2, 4)
                t = t.reshape(3, b * (h // ps) * (w // ps), heads, d, -1)
            q, k, v = t[0], t[1], t[2]
            q = q / (q.norm(dim=-1, keepdim=True) + 1e-12)
            k = k / (k.norm(dim=-1, keepdim=True) + 1e-12)
            attn = torch.softmax(
                (q @ k.transpose(-2, -1)) * self.fn.temperature, dim=-1)
            out = attn @ v
            if self.grid:
                out = out.reshape(b, ps, ps, heads, d, h // ps, w // ps)
                out = out.permute(0, 5, 1, 6, 2, 3, 4)
            else:
                out = out.reshape(b, h // ps, w // ps, heads, d, ps, ps)
                out = out.permute(0, 1, 5, 2, 6, 3, 4)
            out = out.reshape(b, h, w, c)
            return self.fn.project_out(
                out.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)

    class ESAM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            f = max(dim // 4, 16)
            self.f = f
            self.conv1 = nn.Conv2d(dim, f, 1)
            self.conv2 = nn.Conv2d(f, f, 3, stride=2)
            self.conv3 = nn.Conv2d(f, f, 3, padding=1)
            self.conv_f = nn.Conv2d(f, f, 1)
            self.conv4 = nn.Conv2d(f, dim, 1)

        def forward(self, x):  # BHWC
            xc = x.permute(0, 3, 1, 2)
            c1_ = self.conv1(xc)
            c1 = self.conv2(c1_)
            v_max = F.max_pool2d(c1, kernel_size=7, stride=3)
            c3 = self.conv3(v_max)
            c3 = F.interpolate(c3, size=(int(xc.shape[2]), int(xc.shape[3])),
                               mode="bilinear", align_corners=False)
            cf = self.conv_f(c1_)
            c4 = self.conv4(c3 + cf)
            return x * torch.sigmoid(c4.permute(0, 2, 3, 1))

    class OSABlockLayer(nn.Module):
        """Indexed container matching reference `layer` Sequential names."""

        def __init__(self) -> None:
            super().__init__()
            self.add_module("0", MBConvM())
            # impls kept in a plain dict so only their `fn` submodule is
            # registered (under the reference's `{i}.fn.*` key paths)
            self.__dict__["_impls"] = {}
            for i in (2, 4, 5, 6, 8, 10, 11, 12):
                m = {2: AttnM, 8: AttnM, 4: FFNM, 6: FFNM, 10: FFNM,
                     12: FFNM}.get(i)
                mod = m() if m else ChanM(grid=(i == 11))
                holder = nn.Module()
                holder.norm = nn.LayerNorm(dim, eps=1e-5)
                holder.fn = mod.fn
                self._impls[str(i)] = mod
                self.add_module(str(i), holder)

        def forward(self, x):
            b, hh, ww, c = x.shape
            w = win

            def blockify(t):
                t = t.view(b, hh // w, w, ww // w, w, c)
                return t.permute(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)

            def unblock(t):
                t = t.view(b, hh // w, ww // w, w, w, c)
                return t.permute(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, c)

            def gridify(t):
                t = t.view(b, w, hh // w, w, ww // w, c)
                return t.permute(0, 2, 4, 1, 3, 5).reshape(-1, w * w, c)

            def ungrid(t):
                t = t.view(b, hh // w, ww // w, w, w, c)
                return t.permute(0, 3, 1, 4, 2, 5).reshape(b, hh, ww, c)

            def mod(i):
                holder = getattr(self, str(i))
                return holder.norm, self._impls[str(i)]

            x = getattr(self, "0")(x)
            n2, a2 = mod(2)
            x = x + unblock(a2(blockify(n2(x))))
            n4, f4 = mod(4)
            x = x + f4(n4(x))
            n5, c5 = mod(5)
            x = x + c5(n5(x))
            n6, f6 = mod(6)
            x = x + f6(n6(x))
            n8, a8 = mod(8)
            x = x + ungrid(a8(gridify(n8(x))))
            n10, f10 = mod(10)
            x = x + f10(n10(x))
            n11, c11 = mod(11)
            x = x + c11(n11(x))
            n12, f12 = mod(12)
            return x + f12(n12(x))

    class OSAGM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            rl = nn.Module()
            for i in range(block_num):
                layer_holder = nn.Module()
                layer_holder.layer = OSABlockLayer()
                rl.add_module(str(i), layer_holder)
            rl.add_module(str(block_num), nn.Conv2d(dim, dim, 1))
            self.residual_layer = rl
            self.esa = ESAM()

        def forward(self, x):
            h = x
            for i in range(block_num):
                h = getattr(self.residual_layer, str(i)).layer(h)
            tail = getattr(self.residual_layer, str(block_num))
            h = tail(h.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            return self.esa(h + x)

    class OmniSRMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.input = nn.Conv2d(in_ch, dim, 3, padding=1)
            self.residual_layer = nn.ModuleList(
                OSAGM() for _ in range(res_num))
            self.output = nn.Conv2d(dim, dim, 3, padding=1)
            self.up = nn.Sequential(
                nn.Conv2d(dim, out_ch * scale**2, 3, padding=1),
                nn.PixelShuffle(scale))

        def forward(self, x):
            b, _, H, W = x.shape
            ph, pw = (-int(H)) % win, (-int(W)) % win
            if ph or pw:
                x = F.pad(x, (0, pw, 0, ph))
            residual = self.input(x).permute(0, 2, 3, 1)
            h = residual
            for g in self.residual_layer:
                h = g(h)
            h = self.output(h.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            h = (h + residual).permute(0, 3, 1, 2)
            out = self.up(h)
            return out[:, :, : H * scale, : W * scale]

    return OmniSRMirror()


def _hma_mirror(opt: dict[str, Any], scale: int):
    """HMA mirror (BHWC-internal) of neosr_tpu/archs/hma.py — FusedConv/FAB
    interleave, GAB grid cross-attention with chained AffineTransforms, and
    the reference's two GAB quirks (strip-partitioned shifted branch,
    flat-token+channel un-roll) replicated verbatim.  Reference key layout:
    hma_arch.py:265-1403."""
    import torch
    from torch import nn
    from torch.nn import functional as F

    from neosr_tpu.archs.dat import rect_rel_coords
    from neosr_tpu.archs.swin_util import (
        relative_position_index,
        shift_attn_mask,
    )

    dim = opt.get("embed_dim", 60)
    depths = tuple(opt.get("depths", (6, 6, 6, 6)))
    num_heads = tuple(opt.get("num_heads", (6, 6, 6, 6)))
    win0 = opt.get("window_size", 8)
    iv = opt.get("interval_size", 4)
    mlp_ratio = opt.get("mlp_ratio", 2.0)
    patch_norm = opt.get("patch_norm", True)
    img_range = opt.get("img_range", 1.0)
    in_chans = opt.get("in_chans", 3)
    num_feat = 64

    def part(t, win):  # BHWC -> (B_, win*win, C)
        b, h, w, c = t.shape
        t = t.view(b, h // win, win, w // win, win, c)
        return t.permute(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)

    def unpart(t, win, h, w):  # (B_, win*win, C) -> BHWC
        c = t.shape[-1]
        b = t.shape[0] // ((h // win) * (w // win))
        t = t.view(b, h // win, w // win, win, win, c)
        return t.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)

    class WinAttn(nn.Module):
        def __init__(self, wdim: int, win: int, heads: int):
            super().__init__()
            self.wdim, self.win, self.heads = wdim, win, heads
            self.relative_position_bias_table = nn.Parameter(
                torch.zeros((2 * win - 1) ** 2, heads))
            self.proj = nn.Linear(wdim, wdim)

        def forward(self, qkv_windows, mask=None):
            b_, n, c3 = qkv_windows.shape
            c = c3 // 3
            heads = self.heads
            d = c // heads
            win = self.win
            qkv = qkv_windows.reshape(b_, n, 3, heads, d).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            idx = torch.from_numpy(
                relative_position_index(win, win).reshape(-1).copy()).long()
            bias = self.relative_position_bias_table[idx]
            bias = bias.view(n, n, heads).permute(2, 0, 1)
            attn = (q * d**-0.5) @ k.transpose(-2, -1) + bias.unsqueeze(0)
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.view(b_ // nw, nw, heads, n, n)
                attn = attn + mask.unsqueeze(0).unsqueeze(2)
                attn = attn.view(b_, heads, n, n)
            attn = torch.softmax(attn, dim=-1)
            out = (attn @ v).permute(0, 2, 1, 3).reshape(b_, n, c)
            return self.proj(out)

    class DPB(nn.Module):
        def __init__(self, pos_dim: int, heads: int):
            super().__init__()
            self.pos_proj = nn.Linear(2, pos_dim)
            self.pos1 = nn.Sequential(
                nn.LayerNorm(pos_dim), nn.ReLU(), nn.Linear(pos_dim, pos_dim))
            self.pos2 = nn.Sequential(
                nn.LayerNorm(pos_dim), nn.ReLU(), nn.Linear(pos_dim, pos_dim))
            self.pos3 = nn.Sequential(
                nn.LayerNorm(pos_dim), nn.ReLU(), nn.Linear(pos_dim, heads))

        def forward(self, b):
            return self.pos3(self.pos2(self.pos1(self.pos_proj(b))))

    class Affine(nn.Module):
        def __init__(self, adim: int, heads: int):
            super().__init__()
            self.heads = heads
            self.pos = DPB(max(adim // 16, 1), heads)

        def forward(self, q, k, v, gh, gw):
            gh, gw = int(gh), int(gw)  # bake at trace time (mask convention)
            d = q.shape[-1]
            attn = (q * d**-0.5) @ k.transpose(-2, -1)
            biases, idx = rect_rel_coords(gh, gw)
            pos = self.pos(torch.from_numpy(biases.copy()))
            n = gh * gw
            bias = pos[torch.from_numpy(idx.reshape(-1).copy()).long()]
            bias = bias.view(n, n, self.heads).permute(2, 0, 1)
            attn = torch.softmax(attn + bias.unsqueeze(0), dim=-1)
            return attn @ v

    class FusedConv(nn.Module):
        def __init__(self):
            super().__init__()
            mid = dim * 6
            self.pre_norm = nn.LayerNorm(dim, eps=1e-5)
            self.fused_conv = nn.Conv2d(dim, mid, 3, padding=1)
            self.norm1 = nn.LayerNorm(mid, eps=1e-5)
            self.se = nn.ModuleDict({
                "fc1": nn.Conv2d(mid, mid // 2, 1),
                "fc2": nn.Conv2d(mid // 2, mid, 1),
            })
            self.conv3_1x1 = nn.Conv2d(mid, dim, 1)

        def forward(self, x):  # BHWC
            shortcut = x
            h = self.pre_norm(x)
            h = self.fused_conv(h.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            h = F.gelu(self.norm1(h))
            hc = h.permute(0, 3, 1, 2)
            g = hc.mean((2, 3), keepdim=True)
            g = torch.sigmoid(self.se["fc2"](F.silu(self.se["fc1"](g))))
            hc = hc * g
            return self.conv3_1x1(hc).permute(0, 2, 3, 1) + shortcut

    class FAB(nn.Module):
        def __init__(self, heads: int, shift: int):
            super().__init__()
            self.heads, self.shift0 = heads, shift
            self.norm1 = nn.LayerNorm(dim, eps=1e-5)
            self.qkv = nn.Linear(dim, dim * 3)
            self.attn = WinAttn(dim, win0, heads)
            self.norm2 = nn.LayerNorm(dim, eps=1e-5)
            self.mlp = nn.ModuleDict({
                "fc1": nn.Linear(dim, int(dim * mlp_ratio)),
                "fc2": nn.Linear(int(dim * mlp_ratio), dim),
            })

        def forward(self, x):  # BHWC
            b, h, w, c = x.shape
            win, shift = win0, self.shift0
            if min(h, w) <= win:
                shift = 0
                win = min(h, w, win)
            shortcut = x
            qkv = self.qkv(self.norm1(x))
            if shift > 0:
                qkv = torch.roll(qkv, (-shift, -shift), dims=(1, 2))
                mask = torch.from_numpy(shift_attn_mask(h, w, win, shift).copy())
            else:
                mask = None
            self.attn.win = win
            xs = unpart(self.attn(part(qkv, win), mask), win, h, w)
            if shift > 0:
                xs = torch.roll(xs, (shift, shift), dims=(1, 2))
            x = shortcut + xs
            return x + self.mlp["fc2"](F.gelu(self.mlp["fc1"](self.norm2(x))))

    class GABM(nn.Module):
        def __init__(self, heads_full: int):
            super().__init__()
            heads = max(heads_full // 2, 1)
            self.heads = heads
            self.qkv = nn.Linear(dim, dim * 3)
            self.grid_proj = nn.Linear(dim, dim // 2)
            self.grid_attn = nn.ModuleDict({
                "attn_transform1": Affine(dim // 2, heads),
                "attn_transform2": Affine(dim // 2, heads),
            })
            self.window_attn = WinAttn(dim // 4, win0, heads)
            self.window_attn_s = WinAttn(dim // 4, win0, heads)
            self.fc = nn.Linear(dim, dim)
            self.norm1 = nn.LayerNorm(dim, eps=1e-5)
            self.norm2 = nn.LayerNorm(dim, eps=1e-5)
            self.mlp = nn.ModuleDict({
                "fc1": nn.Linear(dim, int(dim * mlp_ratio)),
                "fc2": nn.Linear(int(dim * mlp_ratio), dim),
            })

        def forward(self, x):  # BHWC
            b, h, w, c = x.shape
            win = min(win0, h, w)
            shift = win // 2
            gh, gw = h // iv, w // iv
            heads = self.heads
            shortcut = x
            qkv = self.qkv(x)
            x_window = qkv[..., : c * 3 // 2]
            x_qkv = qkv[..., c * 3 // 2:]

            def grid_shuffle(t):
                cc = t.shape[-1]
                t = t.view(b, gh, iv, gw, iv, cc)
                t = t.permute(0, 2, 4, 1, 3, 5)
                return t.reshape(b * iv * iv, gh * gw, cc)

            def grid_unshuffle(t):
                cc = t.shape[-1]
                t = t.view(b, iv, iv, gh, gw, cc)
                t = t.permute(0, 3, 1, 4, 2, 5)
                return t.reshape(b, h, w, cc)

            half = c // 2
            dh = half // heads
            x_grid = self.grid_proj(grid_shuffle(x))
            g = x_grid.reshape(-1, gh * gw, heads, dh).permute(0, 2, 1, 3)
            t = grid_shuffle(x_qkv).reshape(-1, gh * gw, 3, heads, dh)
            t = t.permute(2, 0, 3, 1, 4)
            q, k, v = t[0], t[1], t[2]
            y = self.grid_attn["attn_transform1"](g, k, v, gh, gw)
            y = self.grid_attn["attn_transform2"](q, g, y, gh, gw)
            y = y.permute(0, 2, 1, 3).reshape(-1, gh * gw, half)
            x_grid_attn = grid_unshuffle(y)

            quarter = (c * 3) // 4
            xw = x_window[..., :quarter]
            xw_s = x_window[..., quarter:]
            self.window_attn.win = win
            self.window_attn_s.win = win
            wa = unpart(self.window_attn(part(xw, win)), win, h, w)
            xw_s = torch.roll(xw_s, (-shift, -shift), dims=(1, 2))
            mask = (torch.from_numpy(shift_attn_mask(h, w, win, shift).copy())
                    if shift > 0 else None)
            # reference quirk: shifted branch is strip-partitioned (plain
            # row-major reshape), then scattered back as window tiles
            was = self.window_attn_s(
                xw_s.reshape(-1, win * win, quarter), mask)
            was = unpart(was, win, h, w)
            # reference quirk: un-roll on the flattened token axis AND the
            # channel axis
            was = was.reshape(b, h * w, c // 4)
            was = torch.roll(was, (shift, shift), dims=(1, 2))
            was = was.reshape(b, h, w, c // 4)

            merged = torch.cat([wa, was, x_grid_attn], dim=-1)
            merged = self.norm1(self.fc(merged))
            x = shortcut + merged
            y2 = self.mlp["fc2"](F.gelu(self.mlp["fc1"](x)))
            return x + self.norm2(y2)

    class Group(nn.Module):
        def __init__(self, gi: int):
            super().__init__()
            blocks = []
            for i in range(depths[gi]):
                if i % 2 == 0:
                    blocks.append(FusedConv())
                blocks.append(FAB(num_heads[gi],
                                  0 if i % 2 == 0 else win0 // 2))
            self.residual_group = nn.ModuleDict({
                "blocks": nn.ModuleList(blocks),
                "gab": GABM(num_heads[gi]),
            })
            self.residual_group.scale = nn.Parameter(torch.zeros(dim))
            self.conv = nn.Conv2d(dim, dim, 3, padding=1)

        def forward(self, x):  # BHWC
            res = x
            for blk in self.residual_group["blocks"]:
                x = blk(x)
            g = self.residual_group["gab"](x)
            x = x + g * self.residual_group.scale
            x = self.conv(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            return x + res

    class Mirror(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_first = nn.Conv2d(in_chans, dim, 3, padding=1)
            if patch_norm:
                self.patch_embed = nn.ModuleDict(
                    {"norm": nn.LayerNorm(dim, eps=1e-5)})
            self.layers = nn.ModuleList(
                Group(gi) for gi in range(len(depths)))
            self.norm = nn.LayerNorm(dim, eps=1e-5)
            self.conv_after_body = nn.Conv2d(dim, dim, 3, padding=1)
            self.conv_before_upsample = nn.Sequential(
                nn.Conv2d(dim, num_feat, 3, padding=1), nn.LeakyReLU(0.01))
            ups = []
            s = scale
            while s > 1:
                if s % 2 == 0:
                    ups += [nn.Conv2d(num_feat, 4 * num_feat, 3, padding=1),
                            nn.PixelShuffle(2)]
                    s //= 2
                else:
                    ups += [nn.Conv2d(num_feat, 9 * num_feat, 3, padding=1),
                            nn.PixelShuffle(3)]
                    s //= 3
            self.upsample = nn.Sequential(*ups)
            self.conv_last = nn.Conv2d(num_feat, in_chans, 3, padding=1)

        def forward(self, x):  # NCHW in/out
            mean = torch.full((1, in_chans, 1, 1), 0.5 if in_chans == 3 else 0.0)
            b, _, H0, W0 = x.shape
            ms = max(win0, iv)
            ph, pw = (-H0) % ms, (-W0) % ms
            if ph or pw:
                x = F.pad(x, (0, pw, 0, ph), mode="reflect")
            x = (x - mean) * img_range
            feat = self.conv_first(x)
            h = feat.permute(0, 2, 3, 1)
            if patch_norm:
                h = self.patch_embed["norm"](h)
            for layer in self.layers:
                h = layer(h)
            h = self.norm(h)
            h = self.conv_after_body(h.permute(0, 3, 1, 2)) + feat
            h = self.conv_before_upsample(h)
            h = self.conv_last(self.upsample(h))
            h = h / img_range + mean
            return h[:, :, : H0 * scale, : W0 * scale]

    return Mirror()


def _dat_mirror(opt: dict[str, Any], scale: int):
    """DAT mirror (BHWC-internal) of neosr_tpu/archs/dat.py — alternating
    axial-spatial (dual rect-window MSA + DynamicPosBias + AIM) and
    axial-channel (normalized channel attention + AIM) blocks, SGFN,
    residual groups.  Reference key layout: dat_arch.py:42-1122.  Shift
    masks bake to constants at trace time (same convention as the swinir
    mirror)."""
    import torch
    from torch import nn
    from torch.nn import functional as F

    from neosr_tpu.archs.dat import rect_rel_coords, rect_shift_mask

    dim = opt.get("embed_dim", 180)
    split_size = tuple(opt.get("split_size", (2, 4)))
    depth = tuple(opt.get("depth", (2, 2, 2, 2)))
    num_heads = tuple(opt.get("num_heads", (2, 2, 2, 2)))
    expansion = opt.get("expansion_factor", 4.0)
    qkv_bias = opt.get("qkv_bias", True)
    qk_scale = opt.get("qk_scale", None)
    upsampler = opt.get("upsampler", "pixelshuffle")
    resi = opt.get("resi_connection", "1conv")
    img_range = opt.get("img_range", 1.0)
    in_chans = opt.get("in_chans", 3)
    num_feat = 64

    class DPB(nn.Module):
        def __init__(self, pos_dim: int, heads: int):
            super().__init__()
            self.pos_proj = nn.Linear(2, pos_dim)
            self.pos1 = nn.Sequential(
                nn.LayerNorm(pos_dim), nn.ReLU(), nn.Linear(pos_dim, pos_dim))
            self.pos2 = nn.Sequential(
                nn.LayerNorm(pos_dim), nn.ReLU(), nn.Linear(pos_dim, pos_dim))
            self.pos3 = nn.Sequential(
                nn.LayerNorm(pos_dim), nn.ReLU(), nn.Linear(pos_dim, heads))

        def forward(self, biases):
            return self.pos3(self.pos2(self.pos1(self.pos_proj(biases))))

    class Branch(nn.Module):
        def __init__(self, bdim: int, hs: int, ws: int, heads: int):
            super().__init__()
            self.bdim, self.hs, self.ws, self.heads = bdim, hs, ws, heads
            self.pos = DPB(max(bdim // 16, 1), heads)

        def forward(self, qkv_sp, mask=None):
            hs, ws, heads, bdim = self.hs, self.ws, self.heads, self.bdim
            b, h, w, _ = qkv_sp.shape
            d = bdim // heads
            scale_ = qk_scale or d**-0.5
            t = qkv_sp.view(b, h // hs, hs, w // ws, ws, 3 * bdim)
            t = t.permute(0, 1, 3, 2, 4, 5).reshape(-1, hs * ws, 3 * bdim)
            b_, n, _ = t.shape
            qkv = t.reshape(b_, n, 3, heads, d).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            biases, idx = rect_rel_coords(hs, ws)
            pos = self.pos(torch.from_numpy(biases.copy()))
            bias = pos[torch.from_numpy(idx.reshape(-1).copy()).long()]
            bias = bias.view(n, n, heads).permute(2, 0, 1)
            attn = (q * scale_) @ k.transpose(-2, -1) + bias.unsqueeze(0)
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.view(b_ // nw, nw, heads, n, n)
                attn = attn + mask.unsqueeze(0).unsqueeze(2)
                attn = attn.view(b_, heads, n, n)
            attn = torch.softmax(attn, dim=-1)
            out = (attn @ v).permute(0, 2, 1, 3).reshape(b_, n, bdim)
            out = out.view(b, h // hs, w // ws, hs, ws, bdim)
            return out.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, bdim)

    def add_aim(mod: nn.Module) -> None:
        """AIM submodules under the reference's flat attn.* names."""
        mod.dwconv = nn.Sequential(
            nn.Conv2d(dim, dim, 3, padding=1, groups=dim),
            nn.BatchNorm2d(dim))
        mod.channel_interaction = nn.Sequential(
            nn.AdaptiveAvgPool2d(1),
            nn.Conv2d(dim, dim // 8, 1), nn.BatchNorm2d(dim // 8),
            nn.GELU(), nn.Conv2d(dim // 8, dim, 1))
        mod.spatial_interaction = nn.Sequential(
            nn.Conv2d(dim, dim // 16, 1), nn.BatchNorm2d(dim // 16),
            nn.GELU(), nn.Conv2d(dim // 16, 1, 1))

    def aim_conv_branch(mod, v_img):  # BHWC -> BHWC (dw + BN + GELU)
        cv = mod.dwconv(v_img.permute(0, 3, 1, 2))
        return F.gelu(cv).permute(0, 2, 3, 1)

    def aim_ch_map(mod, t):  # BHWC (mean over spatial inside)
        m = t.permute(0, 3, 1, 2).mean((2, 3), keepdim=True)
        return mod.channel_interaction[4](F.gelu(
            mod.channel_interaction[2](mod.channel_interaction[1](m))))

    def aim_sp_map(mod, t):  # BHWC -> (b,1,h,w)
        z = t.permute(0, 3, 1, 2)
        return mod.spatial_interaction[3](F.gelu(
            mod.spatial_interaction[1](mod.spatial_interaction[0](z))))

    class SpatialAttn(nn.Module):
        def __init__(self, heads: int, shift: bool):
            super().__init__()
            self.shift = shift
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.proj = nn.Linear(dim, dim)
            half = dim // 2
            self.attns = nn.ModuleList([
                Branch(half, split_size[0], split_size[1], heads // 2),
                Branch(half, split_size[1], split_size[0], heads // 2),
            ])
            add_aim(self)

        def forward(self, x):  # BHWC
            b, h, w, c = x.shape
            s0, s1 = split_size
            sh, sw = s0 // 2, s1 // 2
            qkv = self.qkv(x)
            v_img = qkv[..., 2 * c:]
            ms = max(s0, s1)
            pad_b, pad_r = (-h) % ms, (-w) % ms
            qkv_p = F.pad(qkv.permute(0, 3, 1, 2), (0, pad_r, 0, pad_b)
                          ).permute(0, 2, 3, 1)
            hp, wp = h + pad_b, w + pad_r
            half = c // 2

            def split_qkv(t, lo, hi):
                return torch.cat([t[..., lo:hi], t[..., c + lo: c + hi],
                                  t[..., 2 * c + lo: 2 * c + hi]], dim=-1)

            qkv0 = split_qkv(qkv_p, 0, half)
            qkv1 = split_qkv(qkv_p, half, c)
            if self.shift and min(hp, wp) > ms:
                qkv0 = torch.roll(qkv0, (-sh, -sw), dims=(1, 2))
                qkv1 = torch.roll(qkv1, (-sw, -sh), dims=(1, 2))
                m0 = torch.from_numpy(rect_shift_mask(hp, wp, s0, s1, sh, sw).copy())
                m1 = torch.from_numpy(rect_shift_mask(hp, wp, s1, s0, sw, sh).copy())
                x0 = torch.roll(self.attns[0](qkv0, m0), (sh, sw), dims=(1, 2))
                x1 = torch.roll(self.attns[1](qkv1, m1), (sw, sh), dims=(1, 2))
            else:
                x0 = self.attns[0](qkv0)
                x1 = self.attns[1](qkv1)
            attened = torch.cat([x0, x1], dim=-1)[:, :h, :w, :]

            cv = aim_conv_branch(self, v_img)
            ch = aim_ch_map(self, cv)
            sp = aim_sp_map(self, attened)
            attened = attened * torch.sigmoid(ch.permute(0, 2, 3, 1))
            cv = cv * torch.sigmoid(sp.permute(0, 2, 3, 1))
            return self.proj(attened + cv)

    class ChannelAttn(nn.Module):
        def __init__(self, heads: int):
            super().__init__()
            self.heads = heads
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.proj = nn.Linear(dim, dim)
            self.temperature = nn.Parameter(torch.ones(heads, 1, 1))
            add_aim(self)

        def forward(self, x):  # BHWC
            b, h, w, c = x.shape
            n = h * w
            d = c // self.heads
            qkv = self.qkv(x).reshape(b, n, 3, self.heads, d)
            qkv = qkv.permute(2, 0, 3, 4, 1)  # 3,b,nh,d,n
            q, k, v = qkv[0], qkv[1], qkv[2]
            v_img = v.reshape(b, c, n).reshape(b, c, h, w).permute(0, 2, 3, 1)
            q = q / (q.norm(dim=-1, keepdim=True) + 1e-12)
            k = k / (k.norm(dim=-1, keepdim=True) + 1e-12)
            attn = (q @ k.transpose(-2, -1)) * self.temperature
            attn = torch.softmax(attn, dim=-1)
            out = (attn @ v).reshape(b, c, n).permute(0, 2, 1).reshape(b, h, w, c)
            cv = aim_conv_branch(self, v_img)
            ch = aim_ch_map(self, out)
            sp = aim_sp_map(self, cv)
            out = out * torch.sigmoid(sp.permute(0, 2, 3, 1))
            cv = cv * torch.sigmoid(ch.permute(0, 2, 3, 1))
            return self.proj(out + cv)

    class SGFN(nn.Module):
        def __init__(self):
            super().__init__()
            hidden = int(dim * expansion)
            self.fc1 = nn.Linear(dim, hidden)
            self.sg = nn.ModuleDict({
                "norm": nn.LayerNorm(hidden // 2),
                "conv": nn.Conv2d(hidden // 2, hidden // 2, 3, padding=1,
                                  groups=hidden // 2),
            })
            self.fc2 = nn.Linear(hidden // 2, dim)

        def forward(self, x):  # BHWC
            h = F.gelu(self.fc1(x))
            x1, x2 = h.chunk(2, dim=-1)
            x2 = self.sg["norm"](x2)
            x2 = self.sg["conv"](x2.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            return self.fc2(x1 * x2)

    class Block(nn.Module):
        def __init__(self, rg_idx: int, b_idx: int, heads: int):
            super().__init__()
            self.norm1 = nn.LayerNorm(dim, eps=1e-5)
            self.norm2 = nn.LayerNorm(dim, eps=1e-5)
            shift = (rg_idx % 2 == 0 and b_idx > 0 and (b_idx - 2) % 4 == 0) or (
                rg_idx % 2 != 0 and b_idx % 4 == 0)
            self.attn = (SpatialAttn(heads, shift) if b_idx % 2 == 0
                         else ChannelAttn(heads))
            self.ffn = SGFN()

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.ffn(self.norm2(x))

    class Group(nn.Module):
        def __init__(self, rg_idx: int, d: int, heads: int):
            super().__init__()
            self.blocks = nn.ModuleList(
                Block(rg_idx, i, heads) for i in range(d))
            if resi == "1conv":
                self.conv = nn.Conv2d(dim, dim, 3, padding=1)
            else:
                msg = "dat mirror supports resi_connection='1conv' only"
                raise ValueError(msg)

        def forward(self, x):  # BHWC
            res = x
            for blk in self.blocks:
                x = blk(x)
            x = self.conv(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            return x + res

    class Mirror(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_first = nn.Conv2d(in_chans, dim, 3, padding=1)
            self.before_RG = nn.Sequential(
                nn.Identity(), nn.LayerNorm(dim, eps=1e-5))
            self.layers = nn.ModuleList(
                Group(g, depth[g], num_heads[g]) for g in range(len(depth)))
            self.norm = nn.LayerNorm(dim, eps=1e-5)
            self.conv_after_body = nn.Conv2d(dim, dim, 3, padding=1)
            if upsampler == "pixelshuffle":
                self.conv_before_upsample = nn.Sequential(
                    nn.Conv2d(dim, num_feat, 3, padding=1), nn.LeakyReLU(0.01))
                ups = []
                s = scale
                while s > 1:
                    if s % 2 == 0:
                        ups += [nn.Conv2d(num_feat, 4 * num_feat, 3, padding=1),
                                nn.PixelShuffle(2)]
                        s //= 2
                    else:
                        ups += [nn.Conv2d(num_feat, 9 * num_feat, 3, padding=1),
                                nn.PixelShuffle(3)]
                        s //= 3
                self.upsample = nn.Sequential(*ups)
                self.conv_last = nn.Conv2d(num_feat, in_chans, 3, padding=1)
            else:
                self.upsample = nn.Sequential(
                    nn.Conv2d(dim, in_chans * scale**2, 3, padding=1),
                    nn.PixelShuffle(scale))

        def forward(self, x):  # NCHW in/out
            mean = torch.full((1, in_chans, 1, 1), 0.5 if in_chans == 3 else 0.0)
            x = (x - mean) * img_range
            feat = self.conv_first(x)
            h = self.before_RG[1](feat.permute(0, 2, 3, 1))
            for layer in self.layers:
                h = layer(h)
            h = self.norm(h)
            h = self.conv_after_body(h.permute(0, 3, 1, 2)) + feat
            if upsampler == "pixelshuffle":
                h = self.conv_before_upsample(h)
                h = self.conv_last(self.upsample(h))
            else:
                h = self.upsample(h)
            return h / img_range + mean

    return Mirror()


def _dctlsa_mirror(opt: dict[str, Any], scale: int):
    """DCTLSA mirror (BHWC-internal) of neosr_tpu/archs/dctlsa.py — linear
    window attention (softmax over keys) with BN LocalModule, dense-fused
    LSAB groups.  Reference key layout: dctlsa_arch.py:12-593."""
    import torch
    from torch import nn
    from torch.nn import functional as F

    nf = opt.get("nf", 55)
    num_modules = opt.get("num_modules", 6)
    num_head = opt.get("num_head", 5)
    out_nc = opt.get("out_nc", 3)
    win = 16

    def bn_bhwc(bn: nn.BatchNorm2d, x):
        return bn(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)

    class LocalModule(nn.Module):
        def __init__(self):
            super().__init__()
            self.pointwise_prenorm_0 = nn.BatchNorm2d(nf)
            self.pointwise_conv_0 = nn.Conv2d(nf, nf, 1, bias=False)
            self.depthwise_conv = nn.Conv2d(nf, nf, 3, padding=1, groups=nf,
                                            bias=False)
            self.pointwise_prenorm_1 = nn.BatchNorm2d(nf)
            self.pointwise_conv_1 = nn.Conv2d(nf, nf, 1, bias=False)

        def forward(self, x):  # BHWC
            h = bn_bhwc(self.pointwise_prenorm_0, x).permute(0, 3, 1, 2)
            h = self.depthwise_conv(self.pointwise_conv_0(h))
            h = bn_bhwc(self.pointwise_prenorm_1, h.permute(0, 2, 3, 1))
            return self.pointwise_conv_1(h.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)

    class Attn(nn.Module):
        def __init__(self):
            super().__init__()
            self.qkv = nn.Linear(nf, nf * 3, bias=True)
            self.proj = nn.Linear(nf, nf)
            self.local = LocalModule()

        def forward(self, x):  # BHWC
            b, h, w, c = x.shape
            ws = min(win, h, w)
            local = self.local(x) + x
            qkv = self.qkv(local)  # (b,h,w,3c)
            # window partition
            qkv = qkv.view(b, h // ws, ws, w // ws, ws, 3 * c)
            qkv = qkv.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, 3 * c)
            b_, n, _ = qkv.shape
            d = c // num_head
            qkv = qkv.reshape(b_, n, 3, num_head, d).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            k = torch.softmax(k, dim=-2)
            q = q * d**-0.5
            assoc = k.transpose(-2, -1) @ v
            out = (q @ assoc).permute(0, 2, 1, 3).reshape(b_, n, c)
            out = self.proj(out)
            out = out.view(b, h // ws, w // ws, ws, ws, c)
            out = out.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
            return out + local

    class Block(nn.Module):
        def __init__(self, shift: int):
            super().__init__()
            self.shift = shift
            self.attn = Attn()
            self.mlp = nn.ModuleDict({
                "fc1": nn.Linear(nf, int(nf * 2.0)),
                "fc2": nn.Linear(int(nf * 2.0), nf),
            })

        def forward(self, x):  # BHWC
            s = self.shift
            sx = torch.roll(x, (-s, -s), dims=(1, 2)) if s else x
            sx = self.attn(sx)
            x = torch.roll(sx, (s, s), dims=(1, 2)) if s else sx
            return x + self.mlp["fc2"](F.gelu(self.mlp["fc1"](x)))

    class SwinT(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = nn.ModuleDict({"norm": nn.LayerNorm(nf, eps=1e-5)})
            self.blocks = nn.ModuleList(
                [Block(0), Block(win // 2)])

        def forward(self, x):  # BHWC
            b, h, w, c = x.shape
            ph, pw = (-h) % win, (-w) % win
            if ph or pw:
                x = F.pad(x.permute(0, 3, 1, 2), (0, pw, 0, ph),
                          mode="reflect").permute(0, 2, 3, 1)
            x = self.patch_embed["norm"](x)
            for blk in self.blocks:
                x = blk(x)
            if ph or pw:
                x = x[:, :h, :w, :]
            return x

    class TB(nn.Module):  # B{g}.body.{i}.transformer_body.0 wrapper
        def __init__(self):
            super().__init__()
            self.transformer_body = nn.ModuleList([SwinT()])

        def forward(self, x):
            return self.transformer_body[0](x)

    class Mirror(nn.Module):
        def __init__(self):
            super().__init__()
            self.fea_conv = nn.Conv2d(3, nf, 3, padding=1)
            for g in range(num_modules):
                setattr(self, f"B{g + 1}",
                        nn.ModuleDict({"body": nn.ModuleList([TB(), TB()])}))
            for n in range(1, num_modules):
                setattr(self, f"c{n}",
                        nn.Sequential(nn.Conv2d(nf * (n + 1), nf, 1)))
            self.c = nn.Sequential(nn.Conv2d(nf * num_modules, nf, 1))
            self.LR_conv = nn.Conv2d(nf, nf, 3, padding=1)
            self.upsampler = nn.Sequential(
                nn.Conv2d(nf, out_nc * scale**2, 3, padding=1),
                nn.PixelShuffle(scale))

        def forward(self, x):  # NCHW in/out
            fea = self.fea_conv(x).permute(0, 2, 3, 1)
            outs = []
            cat = fea
            cur = fea
            for i in range(num_modules):
                group = getattr(self, f"B{i + 1}")
                b = group["body"][1](group["body"][0](cur))
                outs.append(b)
                cat = torch.cat([cat, b], dim=-1)
                if i < num_modules - 1:
                    fuse = getattr(self, f"c{i + 1}")
                    cur = F.leaky_relu(
                        fuse(cat.permute(0, 3, 1, 2)).permute(0, 2, 3, 1),
                        0.05)
            out_b = F.leaky_relu(
                self.c(torch.cat(outs, dim=-1).permute(0, 3, 1, 2)), 0.05)
            out_lr = self.LR_conv(out_b) + fea.permute(0, 3, 1, 2)
            return self.upsampler(out_lr)

    return Mirror()


def _eimn_mirror(opt: dict[str, Any], scale: int):
    """EIMN mirror (NCHW torch) of neosr_tpu/archs/eimn.py — MOLRCM
    multi-dilated depthwise attention, SADFFM gated FFN with DFFM, BN in
    eval mode (running stats loaded via the batch_stats side-channel).
    Reference key layout: eimn_arch.py:48-319."""
    import torch
    from torch import nn
    from torch.nn import functional as F

    dim = opt.get("embed_dims", 64)
    depths = opt.get("depths", 1)
    num_stages = opt.get("num_stages", 16)
    mlp_ratio = opt.get("mlp_ratios", 2.66)

    class MOLRCM(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = int((3 / 8) * dim)
            self.c2 = int((1 / 8) * dim)
            self.proj_value = nn.Sequential(nn.Conv2d(dim, dim, 1))
            self.proj_query = nn.Sequential(nn.Conv2d(dim, dim, 1))
            self.region = nn.Conv2d(dim, dim, 5, padding=2, groups=dim)
            self.spatial_1 = nn.Conv2d(
                self.c1, self.c1, 5, padding=4, dilation=2, groups=self.c1)
            c3 = dim - self.c1 - self.c2
            self.spatial_2 = nn.Conv2d(
                c3, c3, 7, padding=9, dilation=3, groups=c3)
            self.fusion = nn.Conv2d(dim, dim, 1)
            self.out = nn.Conv2d(dim, dim, 1)

        def forward(self, x):
            value = self.proj_value(x)
            query = self.region(F.gelu(self.proj_query(x)))
            q1 = self.spatial_1(query[:, : self.c1])
            q2 = query[:, self.c1 : self.c1 + self.c2]
            q3 = self.spatial_2(query[:, self.c1 + self.c2 :])
            fused = self.fusion(torch.cat([q1, q2, q3], dim=1))
            return self.out(F.silu(fused) * value)

    class DFFM(nn.Module):
        def __init__(self):
            super().__init__()
            rc = int(dim * 0.25)
            self.norm = nn.LayerNorm(dim, eps=1e-6)
            self.global_reduce = nn.Conv2d(dim, rc, 1)
            self.local_reduce = nn.Conv2d(dim, rc, 1)
            self.channel_expand = nn.Conv2d(rc, dim, 1)
            self.spatial_expand = nn.Conv2d(2 * rc, 1, 1)

        def forward(self, x):
            identity = x
            x = self.norm(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
            x_global = F.gelu(self.global_reduce(x.mean((2, 3), keepdim=True)))
            x_local = F.gelu(self.local_reduce(x))
            c_attn = torch.sigmoid(self.channel_expand(x_global))
            g = x_global.expand(-1, -1, *x_local.shape[2:])
            s_attn = torch.sigmoid(
                self.spatial_expand(torch.cat([x_local, g], dim=1)))
            return identity * (c_attn * s_attn)

    class SADFFM(nn.Module):
        def __init__(self):
            super().__init__()
            hidden = int(dim * mlp_ratio)
            self.linear_in = nn.Conv2d(dim, hidden * 2, 1)
            self.SAL = nn.Conv2d(hidden * 2, hidden * 2, 3, padding=1,
                                 groups=hidden * 2)
            self.linear_out = nn.Conv2d(hidden, dim, 1)
            self.DFFM = DFFM()

        def forward(self, x):
            x = self.SAL(self.linear_in(x))
            x1, x2 = x.chunk(2, dim=1)
            x = self.linear_out(F.gelu(x1) * x2)
            return self.DFFM(x)

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = nn.BatchNorm2d(dim)
            self.norm2 = nn.BatchNorm2d(dim)
            self.attn = MOLRCM()
            self.mlp = SADFFM()
            self.layer_scale_1 = nn.Parameter(torch.ones(dim))
            self.layer_scale_2 = nn.Parameter(torch.ones(dim))

        def forward(self, x):
            x = x + self.layer_scale_1.view(1, -1, 1, 1) * self.attn(self.norm1(x))
            return x + self.layer_scale_2.view(1, -1, 1, 1) * self.mlp(self.norm2(x))

    class Mirror(nn.Module):
        def __init__(self):
            super().__init__()
            self.head = nn.Sequential(nn.Conv2d(3, dim, 3, padding=1))
            for s in range(1, num_stages + 1):
                setattr(self, f"block{s}",
                        nn.ModuleList(Block() for _ in range(depths)))
                setattr(self, f"norm{s}", nn.LayerNorm(dim, eps=1e-5))
            self.tail = nn.Sequential(nn.Conv2d(dim, 3 * scale**2, 3, padding=1))
            self.shuffle = nn.PixelShuffle(scale)

        def forward(self, x):
            h = self.head(x)
            identity = h
            for s in range(1, num_stages + 1):
                for blk in getattr(self, f"block{s}"):
                    h = blk(h)
                norm = getattr(self, f"norm{s}")
                h = norm(h.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
            return self.shuffle(self.tail(identity + h))

    return Mirror()


def _ditn_mirror(opt: dict[str, Any], scale: int):
    """Torch mirror of our flax DITN (archs/ditn.py): UFONE blocks of ITL
    (channel self-attention over patch tokens, tanh-gated) then SAL (dilated
    depthwise spatial attention), pixel-shuffle-direct head.  The reference
    refuses ONNX for ditn (/root/reference/convert.py:91); this mirror
    exports it fine — coverage beyond the reference."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    dim = opt.get("dim", 60)
    n_itl = opt.get("ITL_blocks", 4)
    n_sal = opt.get("SAL_blocks", 4)
    n_ufone = opt.get("UFONE_blocks", 1)
    exp = opt.get("ffn_expansion_factor", 2.0)
    bias = opt.get("bias", False)
    ps = opt.get("patch_size", 8)
    in_ch = opt.get("inp_channels", 3)

    class FFN(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            hid = int(dim * exp)
            self.project_in = nn.Conv2d(dim, hid * 2, 1, bias=bias)
            self.dwconv = nn.Conv2d(hid * 2, hid * 2, 3, padding=1,
                                    groups=hid * 2, bias=bias)
            self.project_out = nn.Conv2d(hid, dim, 1, bias=bias)

        def forward(self, x):
            x = self.dwconv(self.project_in(x))
            x1, x2 = x.chunk(2, dim=1)
            return self.project_out(F.gelu(x1) * x2)

    class ISA(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.qkv = nn.Linear(dim, dim * 3, bias=True)
            self.project_out = nn.Conv2d(dim, dim, 1, bias=bias)

        def forward(self, x):  # NCHW
            b, c, h, w = x.shape
            n = h * w
            tokens = x.permute(0, 2, 3, 1).reshape(b, n, c)
            q, k, v = self.qkv(tokens).chunk(3, dim=-1)
            q, k, v = (t.transpose(1, 2) for t in (q, k, v))  # (b, c, n)
            q = q / (q.norm(dim=-1, keepdim=True) + 1e-12)
            k = k / (k.norm(dim=-1, keepdim=True) + 1e-12)
            attn = torch.softmax((q @ k.transpose(-2, -1)) * n**-0.5, dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(b, h, w, c)
            return self.project_out(out.permute(0, 3, 1, 2))

    class SDA(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.scale = nn.Parameter(torch.zeros(1, dim, 1, 1))
            self.proj_first = nn.Sequential(nn.Conv2d(dim, dim * 2, 1))
            self.DConvs = nn.Sequential(
                nn.Conv2d(dim, dim, 5, padding=2, groups=dim),
                nn.Conv2d(dim, dim, 7, padding=9, dilation=3, groups=dim),
                nn.Conv2d(dim, dim, 1))
            self.proj_last = nn.Sequential(nn.Conv2d(dim, dim, 1))

        def forward(self, x):
            x = self.proj_first(x)
            a, x = x.chunk(2, dim=1)
            a = self.DConvs(a)
            return self.proj_last(x * a) * self.scale

    class ITL(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.conv1 = nn.Conv2d(dim, dim, 1)
            self.attn = ISA()
            self.conv2 = nn.Conv2d(dim, dim, 1)
            self.ffn = FFN()

        def forward(self, x):
            x = x + self.attn(self.conv1(torch.tanh(x)))
            return x + self.ffn(self.conv2(torch.tanh(x)))

    class SAL(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.conv1 = nn.Conv2d(dim, dim, 1)
            self.SDA = SDA()
            self.conv2 = nn.Conv2d(dim, dim, 1)
            self.ffn = FFN()

        def forward(self, x):
            x = x + self.SDA(self.conv1(torch.tanh(x)))
            return x + self.ffn(self.conv2(torch.tanh(x)))

    class DITNMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.sft = nn.Conv2d(in_ch, dim, 3, padding=1)
            self.UFONE = nn.ModuleList()
            for _ in range(n_ufone):
                blk = nn.Module()
                blk.ITLs = nn.ModuleList(ITL() for _ in range(n_itl))
                blk.SALs = nn.ModuleList(SAL() for _ in range(n_sal))
                self.UFONE.append(blk)
            self.conv_after_body = nn.Conv2d(dim, dim, 3, padding=1)
            self.upsample = nn.Sequential(
                nn.Conv2d(dim, 3 * scale**2, 3, padding=1),
                nn.PixelShuffle(scale))

        def forward(self, x):
            b, _, H0, W0 = x.shape
            ph, pw = (-H0) % ps, (-W0) % ps
            if ph or pw:
                x = F.pad(x, (0, pw, 0, ph), mode="reflect")
            h, w = x.shape[2], x.shape[3]
            sft = self.sft(x)
            feat = sft
            for blk in self.UFONE:
                local = feat.permute(0, 2, 3, 1).reshape(
                    b, h // ps, ps, w // ps, ps, dim)
                local = local.permute(0, 1, 3, 2, 4, 5).reshape(
                    -1, ps, ps, dim).permute(0, 3, 1, 2)
                for itl in blk.ITLs:
                    local = itl(local)
                local = local.permute(0, 2, 3, 1).reshape(
                    b, h // ps, w // ps, ps, ps, dim)
                feat = local.permute(0, 1, 3, 2, 4, 5).reshape(
                    b, h, w, dim).permute(0, 3, 1, 2)
                for sal in blk.SALs:
                    feat = sal(feat)
            feat = self.conv_after_body(feat)
            out = self.upsample(feat + sft)
            return out[:, :, : H0 * scale, : W0 * scale]

    return DITNMirror()


def _craft_mirror(opt: dict[str, Any], scale: int):
    """Torch mirror of our flax CRAFT (archs/craft.py): CRFB groups of SRWAB
    rect-window attention (dual branches, DynamicPosBias, LePE, unmasked
    shifts) + HFERB conv/max-pool + HFB channel cross-attention fusion.  The
    reference refuses ONNX for craft (/root/reference/convert.py:91); this
    mirror exports it — coverage beyond the reference."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from neosr_tpu.archs.dat import rect_rel_coords

    dim = opt.get("embed_dim", 48)
    depths = list(opt.get("depths", (2, 2, 2, 2)))
    heads = list(opt.get("num_heads", (6, 6, 6, 6)))
    s0 = opt.get("split_size_0", 4)
    s1 = opt.get("split_size_1", 16)
    ws = opt.get("window_size", 16)
    mlp_ratio = opt.get("mlp_ratio", 2.0)
    img_range = opt.get("img_range", 1.0)
    in_chans = opt.get("in_chans", 3)
    resi = opt.get("resi_connection", "1conv")
    if resi != "1conv":
        msg = f"craft ONNX mirror supports resi_connection='1conv', got {resi}"
        raise ValueError(msg)

    class DPB(nn.Module):
        def __init__(self, branch_dim: int, n_heads: int) -> None:
            super().__init__()
            pd = max(branch_dim // 16, 1)
            self.pos_proj = nn.Linear(2, pd)
            self.pos1 = nn.Sequential(nn.LayerNorm(pd), nn.Identity(),
                                      nn.Linear(pd, pd))
            self.pos2 = nn.Sequential(nn.LayerNorm(pd), nn.Identity(),
                                      nn.Linear(pd, pd))
            self.pos3 = nn.Sequential(nn.LayerNorm(pd), nn.Identity(),
                                      nn.Linear(pd, n_heads))

        def forward(self, b):
            h = self.pos_proj(b)
            for seq in (self.pos1, self.pos2, self.pos3):
                h = seq[2](F.relu(seq[0](h)))
            return h

    class Branch(nn.Module):  # SpatialAttentionBranch (unmasked)
        def __init__(self, bdim: int, hs: int, wss: int, n_heads: int) -> None:
            super().__init__()
            self.bdim, self.hs, self.ws, self.n_heads = bdim, hs, wss, n_heads
            self.pos = DPB(bdim, n_heads)
            biases, idx = rect_rel_coords(hs, wss)
            self.register_buffer("biases", torch.from_numpy(biases.copy()),
                                 persistent=False)
            self.register_buffer("rpi", torch.from_numpy(idx.copy()).long(),
                                 persistent=False)

        def forward(self, qkv_sp):
            b, h, w, _ = qkv_sp.shape
            hs, wss, nh = self.hs, self.ws, self.n_heads
            d = self.bdim // nh
            win = qkv_sp.view(b, h // hs, hs, w // wss, wss, 3 * self.bdim)
            win = win.permute(0, 1, 3, 2, 4, 5).reshape(
                -1, hs * wss, 3 * self.bdim)
            b_, n, _ = win.shape
            qkv = win.view(b_, n, 3, nh, d).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            pos = self.pos(self.biases)
            bias = pos[self.rpi.view(-1)].view(n, n, nh).permute(2, 0, 1)
            attn = (q * d**-0.5) @ k.transpose(-2, -1) + bias[None]
            attn = torch.softmax(attn, dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(b_, n, self.bdim)
            out = out.view(b, h // hs, w // wss, hs, wss, self.bdim)
            return out.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, self.bdim)

    class SRWAB(nn.Module):
        def __init__(self, n_heads: int, shift: bool) -> None:
            super().__init__()
            self.shift = shift
            self.norm1 = nn.LayerNorm(dim, eps=1e-5)
            self.norm2 = nn.LayerNorm(dim, eps=1e-5)
            self.qkv = nn.Linear(dim, dim * 3, bias=True)
            self.attns = nn.ModuleList([
                Branch(dim // 2, s0, s1, n_heads // 2),
                Branch(dim // 2, s1, s0, n_heads // 2)])
            self.get_v = nn.Conv2d(dim, dim, 3, padding=1, groups=dim)
            self.proj = nn.Linear(dim, dim)
            hidden = int(dim * mlp_ratio)
            self.mlp = nn.ModuleDict({})
            self.mlp.fc1 = nn.Linear(dim, hidden)
            self.mlp.fc2 = nn.Linear(hidden, dim)

        def attn_forward(self, x):  # BHWC; flax L_SA with use_mask=False
            b, h, w, c = x.shape
            sh, sw = s0 // 2, s1 // 2
            qkv = self.qkv(x)
            v_img = qkv[..., 2 * c:]
            ms = max(s0, s1)
            pad_b, pad_r = (-h) % ms, (-w) % ms
            qkv_p = F.pad(qkv.permute(0, 3, 1, 2), (0, pad_r, 0, pad_b))
            qkv_p = qkv_p.permute(0, 2, 3, 1)
            hp, wp = h + pad_b, w + pad_r
            half = c // 2

            def split_qkv(t, lo, hi):
                return torch.cat([t[..., lo:hi], t[..., c + lo: c + hi],
                                  t[..., 2 * c + lo: 2 * c + hi]], dim=-1)

            qkv0 = split_qkv(qkv_p, 0, half)
            qkv1 = split_qkv(qkv_p, half, c)
            if self.shift and min(hp, wp) > ms:
                qkv0 = torch.roll(qkv0, (-sh, -sw), dims=(1, 2))
                qkv1 = torch.roll(qkv1, (-sw, -sh), dims=(1, 2))
                x0 = torch.roll(self.attns[0](qkv0), (sh, sw), dims=(1, 2))
                x1 = torch.roll(self.attns[1](qkv1), (sw, sh), dims=(1, 2))
            else:
                x0 = self.attns[0](qkv0)
                x1 = self.attns[1](qkv1)
            att = torch.cat([x0, x1], dim=-1)[:, :h, :w, :]
            lcm = self.get_v(v_img.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            return self.proj(att + lcm)

        def forward(self, x):  # BHWC
            x = x + self.attn_forward(self.norm1(x))
            return x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))

    class HFERB(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            mid = dim // 2
            self.conv = nn.Conv2d(mid, mid, 3, padding=1)
            self.fc = nn.Conv2d(mid, mid, 1)
            self.last_fc = nn.Conv2d(dim, dim, 1)

        def forward(self, x):  # NCHW
            mid = dim // 2
            lfe = F.gelu(self.conv(x[:, :mid]))
            hfe = F.gelu(self.fc(F.max_pool2d(x[:, mid:], 3, 1, 1)))
            return x + self.last_fc(torch.cat([lfe, hfe], dim=1))

    class HFBAttn(nn.Module):
        def __init__(self, n_heads: int) -> None:
            super().__init__()
            self.temperature = nn.Parameter(torch.ones(n_heads, 1, 1))
            self.q = nn.Conv2d(dim, dim, 1, bias=False)
            self.q_dwconv = nn.Conv2d(dim, dim, 3, padding=1, groups=dim,
                                      bias=False)
            self.kv = nn.Conv2d(dim, dim * 2, 1, bias=False)
            self.kv_dwconv = nn.Conv2d(dim * 2, dim * 2, 3, padding=1,
                                       groups=dim * 2, bias=False)
            self.project_out = nn.Conv2d(dim, dim, 1, bias=False)

    class HFB(nn.Module):
        def __init__(self, n_heads: int) -> None:
            super().__init__()
            self.n_heads = n_heads
            self.norm1 = nn.Module()
            self.norm1.body = nn.LayerNorm(dim, eps=1e-5)
            self.norm2 = nn.Module()
            self.norm2.body = nn.LayerNorm(dim, eps=1e-5)
            self.attn = HFBAttn(n_heads)
            hid = int(dim * 2.66)
            self.ffn = nn.ModuleDict({})
            self.ffn.project_in = nn.Conv2d(dim, hid * 2, 1, bias=False)
            self.ffn.dwconv = nn.Conv2d(hid * 2, hid * 2, 3, padding=1,
                                        groups=hid * 2, bias=False)
            self.ffn.project_out = nn.Conv2d(hid, dim, 1, bias=False)

        def forward(self, low, high):  # BHWC
            b, h, w, c = low.shape
            nh = self.n_heads
            d = c // nh
            n = h * w
            ln = self.norm1.body(low)
            q = self.attn.q_dwconv(self.attn.q(high.permute(0, 3, 1, 2)))
            kv = self.attn.kv_dwconv(self.attn.kv(ln.permute(0, 3, 1, 2)))
            k, v = kv[:, :c], kv[:, c:]

            def chan(t):  # NCHW -> (b, heads, d, n)
                return t.permute(0, 2, 3, 1).reshape(b, n, nh, d).permute(
                    0, 2, 3, 1)

            qh, kh, vh = chan(q), chan(k), chan(v)
            qh = qh / (qh.norm(dim=-1, keepdim=True) + 1e-12)
            kh = kh / (kh.norm(dim=-1, keepdim=True) + 1e-12)
            attn = torch.softmax(
                torch.einsum("bhdn,bhen->bhde", qh, kh)
                * self.attn.temperature, dim=-1)
            out = torch.einsum("bhde,bhen->bhdn", attn, vh)
            out = out.permute(0, 3, 1, 2).reshape(b, h, w, c)
            out = self.attn.project_out(
                out.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
            x = low + out
            y = self.norm2.body(x).permute(0, 3, 1, 2)
            y = self.ffn.dwconv(self.ffn.project_in(y))
            y1, y2 = y.chunk(2, dim=1)
            y = self.ffn.project_out(F.gelu(y1) * y2).permute(0, 2, 3, 1)
            return x + y

    class CraftMirror(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.conv_first = nn.Conv2d(in_chans, dim, 3, padding=1)
            self.layers = nn.ModuleList()
            for gi, depth in enumerate(depths):
                layer = nn.Module()
                rg = nn.Module()
                rg.srwa_blocks = nn.ModuleList(
                    SRWAB(heads[gi], j % 2 == 1) for j in range(2 * depth))
                rg.hfer_blocks = nn.ModuleList(HFERB() for _ in range(depth))
                rg.hf_blocks = nn.ModuleList(
                    HFB(heads[gi]) for _ in range(depth))
                layer.residual_group = rg
                layer.conv = nn.Conv2d(dim, dim, 3, padding=1)
                self.layers.append(layer)
            self.norm = nn.Module()
            self.norm.body = nn.LayerNorm(dim, eps=1e-5)
            self.conv_after_body = nn.Conv2d(dim, dim, 3, padding=1)
            self.upsample = nn.Sequential(
                nn.Conv2d(dim, in_chans * scale**2, 3, padding=1),
                nn.PixelShuffle(scale))

        def forward(self, x):
            mean = 0.5 if in_chans == 3 else 0.0
            _, _, H0, W0 = x.shape
            # always a full extra window, symmetric (edge-inclusive) pad
            ph = (H0 // ws + 1) * ws - H0
            pw = (W0 // ws + 1) * ws - W0
            x = torch.cat([x, x.flip(2)[:, :, :ph]], dim=2)
            x = torch.cat([x, x.flip(3)[:, :, :, :pw]], dim=3)
            x = (x - mean) * img_range
            feat = self.conv_first(x).permute(0, 2, 3, 1)
            h = feat
            for layer in self.layers:
                res = h
                rg = layer.residual_group
                for i in range(len(rg.hf_blocks)):
                    low = rg.srwa_blocks[2 * i](h)
                    low = rg.srwa_blocks[2 * i + 1](low)
                    high = rg.hfer_blocks[i](
                        h.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
                    h = rg.hf_blocks[i](low, high)
                h = layer.conv(h.permute(0, 3, 1, 2)).permute(0, 2, 3, 1) + res
            h = self.norm.body(h)
            h = self.conv_after_body(
                h.permute(0, 3, 1, 2)).permute(0, 2, 3, 1) + feat
            out = self.upsample(h.permute(0, 3, 1, 2))
            out = out / img_range + mean
            return out[:, :, : H0 * scale, : W0 * scale]

    return CraftMirror()


_MIRRORS = {
    "compact": _compact_mirror,
    "span": _span_mirror,
    "esrgan": _esrgan_mirror,
    "plksr": _plksr_mirror,
    "realplksr": _realplksr_mirror,
    "spanplus": _spanplus_mirror,
    "swinir": _swinir_mirror,
    "hat": _hat_mirror,
    "atd": _atd_mirror,
    "drct": _drct_mirror,
    "cugan": _cugan_mirror,
    "safmn": _safmn_mirror,
    "man": _man_mirror,
    "mosr": _mosr_mirror,
    "light_safmnpp": _light_safmnpp_mirror,
    "srformer": _srformer_mirror,
    "msdan": _msdan_mirror,
    "hit_srf": _hitsrf_mirror,
    "grformer": _grformer_mirror,
    "rgt": _rgt_mirror,
    "omnisr": _omnisr_mirror,
    "eimn": _eimn_mirror,
    "dctlsa": _dctlsa_mirror,
    "dat": _dat_mirror,
    "hma": _hma_mirror,
    "ditn": _ditn_mirror,
    "craft": _craft_mirror,
}


def mirror_families() -> tuple[str, ...]:
    return tuple(_MIRRORS)


def build_torch_mirror(arch_type: str, net_opt: dict[str, Any], scale: int,
                       flax_params, batch_stats=None) -> "Any":
    """Build a torch module computing the same function as the flax net.

    `flax_params` is the live flax param pytree; weights are routed through
    the reference-layout exporter so the mirror, a `.pth` export, and the
    torch ecosystem all agree on one layout.
    """
    import torch

    from neosr_tpu.utils.torch_interop import family, to_torch_state_dict

    fam = family(arch_type)
    if fam not in _MIRRORS:
        msg = (
            f"no ONNX torch mirror for arch '{arch_type}' "
            f"(available: {', '.join(sorted(_MIRRORS))})"
        )
        raise ValueError(msg)
    mirror = _MIRRORS[fam](net_opt, scale)
    sd = to_torch_state_dict(flax_params, arch_type, batch_stats=batch_stats)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    missing, unexpected = mirror.load_state_dict(tensors, strict=False)
    if missing:  # unexpected keys are fine (train-branch weights, markers)
        msg = f"mirror for {arch_type} missing weights: {missing[:8]}"
        raise ValueError(msg)
    mirror.eval()
    return mirror


def export_onnx(mirror, path, shape_hw: tuple[int, int] = (256, 256),
                channels: int = 3, dynamic: bool = True,
                opset: int = 17, fp16: bool = False) -> None:
    """torch.onnx.export with the reference's axis conventions
    (/root/reference/convert.py:126-138): NCHW input named 'input', output
    'output', dynamic batch/height/width unless a static shape is pinned.
    With `fp16`, traces a half-precision graph (the reference emits a
    *_fp16.onnx alongside, convert.py:168-181)."""
    import torch

    ensure_onnx_exportable()
    h, w = shape_hw
    x = torch.randn(1, channels, h, w)
    if fp16:
        x = x.half()
    dyn = (
        {"input": {0: "batch", 2: "height", 3: "width"},
         "output": {0: "batch", 2: "height", 3: "width"}}
        if dynamic else None
    )
    with torch.inference_mode():
        torch.onnx.export(
            mirror, x, str(path), opset_version=opset, dynamo=False,
            input_names=["input"], output_names=["output"], dynamic_axes=dyn,
        )
