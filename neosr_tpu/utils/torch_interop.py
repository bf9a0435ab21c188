"""Import reference-ecosystem torch checkpoints into our flax param trees.

The reference (and the wider SR model ecosystem around it — openmodeldb,
chaiNNer) distributes trained generators as torch ``state_dict``s saved
either raw or wrapped as ``{"params": sd}`` / ``{"params_ema": sd}``
(reference base.py:281-354).  This module converts those key layouts into
neosr_tpu's flax parameter trees so users switching frameworks keep their
existing models:

* ``compact``  — SRVGGNetCompact (reference compact_arch.py:12-85)
* ``esrgan``   — RRDBNet (reference esrgan_arch.py:145-214)
* ``span``     — SPAN (reference span_arch.py:225-294); the train-time
  Conv3XC branches (sk + 1x1/3x3/1x1) are imported, fused ``eval_conv``
  tensors are ignored (they are derived state, span_arch.py:143-179)

Conventions converted: conv kernels OIHW -> HWIO, PReLU ``weight`` ->
``alpha``.  Entry points:

* :func:`convert_state_dict` — flat torch ``{key: ndarray}`` -> nested tree
* :func:`load_torch_checkpoint` — ``.pth``/``.pt`` file -> nested tree
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Callable

import numpy as np

from neosr_tpu.utils.checkpoint import unflatten_params

PARAM_KEYS = ("params-ema", "params_ema", "params")


def _k(w: np.ndarray) -> np.ndarray:
    """Conv kernel OIHW (torch) -> HWIO (flax)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _put_conv(out: dict, scope: str, sd: dict, torch_prefix: str, used: set) -> None:
    out[f"{scope}.Conv_0.kernel"] = _k(sd[f"{torch_prefix}.weight"])
    used.add(f"{torch_prefix}.weight")
    bias = sd.get(f"{torch_prefix}.bias")
    if bias is not None:
        out[f"{scope}.Conv_0.bias"] = bias
        used.add(f"{torch_prefix}.bias")


def convert_compact(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """SRVGGNetCompact: body.{2i} convs / body.{2i+1} activations in call
    order map onto Conv2d_i / PReLU_i (insertion order is definition order,
    which equals forward order — reference compact_arch.py:47-85)."""
    out: dict[str, np.ndarray] = {}
    conv_i = prelu_i = 0
    for key, val in sd.items():
        if key.endswith(".weight") and val.ndim == 4:
            out[f"Conv2d_{conv_i}.Conv_0.kernel"] = _k(val)
            bias = sd.get(key[: -len(".weight")] + ".bias")
            if bias is not None:
                out[f"Conv2d_{conv_i}.Conv_0.bias"] = bias
            conv_i += 1
        elif val.ndim == 1 and key.endswith(".weight"):
            out[f"PReLU_{prelu_i}.alpha"] = val
            prelu_i += 1
    return out


_ESRGAN_TOP = {
    "conv_first": "Conv2d_0",
    "conv_body": "Conv2d_1",
    "conv_up1": "Conv2d_2",
    "conv_up2": "Conv2d_3",
    # conv_last is constructed before conv_hr in our compact-module
    # expression `Conv2d(out_ch)(lrelu(Conv2d(feat)(x)))`, so it takes the
    # earlier auto-name (flax names follow construction order)
    "conv_hr": "Conv2d_5",
    "conv_last": "Conv2d_4",
}


def convert_esrgan(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """RRDBNet: body.{i}.rdb{j}.conv{k} -> RRDB_i.ResidualDenseBlock_{j-1}
    .Conv2d_{k-1}; named head/tail convs per _ESRGAN_TOP."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    for key in sd:
        if key in used or not key.endswith(".weight"):
            continue
        prefix = key[: -len(".weight")]
        m = re.fullmatch(r"body\.(\d+)\.rdb(\d)\.conv(\d)", prefix)
        if m:
            i, j, k = (int(g) for g in m.groups())
            scope = f"RRDB_{i}.ResidualDenseBlock_{j - 1}.Conv2d_{k - 1}"
        elif prefix in _ESRGAN_TOP:
            scope = _ESRGAN_TOP[prefix]
        else:
            continue
        _put_conv(out, scope, sd, prefix, used)
    return out


def _conv3xc(out: dict, scope: str, sd: dict, torch_prefix: str, used: set) -> None:
    """Conv3XC train-time branches: sk (1x1 skip) + conv.0/1/2 (1x1-3x3-1x1).
    The fused eval_conv is derived state and skipped (span_arch.py:143-179)."""
    for t_sub, o_sub in (
        ("sk", "Conv2d_0"),
        ("conv.0", "Conv2d_1"),
        ("conv.1", "Conv2d_2"),
        ("conv.2", "Conv2d_3"),
    ):
        _put_conv(out, f"{scope}.{o_sub}", sd, f"{torch_prefix}.{t_sub}", used)


def convert_span(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    _conv3xc(out, "Conv3XC_0", sd, "conv_1", used)
    for i in range(1, 7):
        for j in range(1, 4):
            _conv3xc(out, f"SPAB_{i - 1}.Conv3XC_{j - 1}", sd, f"block_{i}.c{j}_r", used)
    _conv3xc(out, "Conv3XC_1", sd, "conv_2", used)
    _put_conv(out, "Conv2d_0", sd, "conv_cat", used)
    _put_conv(out, "Conv2d_1", sd, "upsampler.0", used)
    return out


def _dysample(out: dict, scope: str, sd: dict, torch_prefix: str, used: set) -> None:
    """DySample (reference arch_util.py:30-115): offset conv, bias-free
    scope conv, optional 1x1 end_conv; the init_pos buffer is derived."""
    _put_conv(out, f"{scope}.Conv2d_0", sd, f"{torch_prefix}.offset", used)
    _put_conv(out, f"{scope}.Conv2d_1", sd, f"{torch_prefix}.scope", used)
    if f"{torch_prefix}.end_conv.weight" in sd:
        _put_conv(out, f"{scope}.Conv2d_2", sd, f"{torch_prefix}.end_conv", used)
    used.add(f"{torch_prefix}.init_pos")


def _plk_block(out: dict, scope: str, sd: dict, tp: str, used: set,
               mixer_names: tuple[str, str]) -> None:
    """One PLKBlock / RealPLKBlock (reference plksr_arch.py:280-346,
    realplksr_arch.py:56-100). `mixer_names` = (torch attr, our module name)
    — plksr spells it `channe_mixer` (sic), realplksr `channel_mixer`."""
    t_mix, o_mix = mixer_names
    _put_conv(out, f"{scope}.{o_mix}.Conv2d_0", sd, f"{tp}.{t_mix}.0", used)
    _put_conv(out, f"{scope}.{o_mix}.Conv2d_1", sd, f"{tp}.{t_mix}.2", used)
    if f"{tp}.lk.conv.weight" in sd:
        _put_conv(out, f"{scope}.PLKConv_0.Conv2d_0", sd, f"{tp}.lk.conv", used)
    elif f"{tp}.lk.mn_conv.weight" in sd:
        for i, sub in enumerate(("mn_conv", "nm_conv", "nn_conv")):
            _put_conv(out, f"{scope}.RectSparsePLKConv_0.Conv2d_{i}", sd,
                      f"{tp}.lk.{sub}", used)
    else:
        msg = f"unsupported lk variant in {tp} (SparsePLK import not implemented)"
        raise ValueError(msg)
    if f"{tp}.attn.f.0.weight" in sd:
        _put_conv(out, f"{scope}.EA_0.Conv2d_0", sd, f"{tp}.attn.f.0", used)
    _put_conv(out, f"{scope}.Conv2d_0", sd, f"{tp}.refine", used)
    if f"{tp}.norm.weight" in sd:  # realplksr GroupNorm
        out[f"{scope}.GroupNorm_0.scale"] = sd[f"{tp}.norm.weight"]
        out[f"{scope}.GroupNorm_0.bias"] = sd[f"{tp}.norm.bias"]
        used.update((f"{tp}.norm.weight", f"{tp}.norm.bias"))


def _ccm_module_name(sd: dict, tp: str, t_mix: str) -> str:
    """Infer CCM/ICCM/DCCM from kernel sizes: 3x3+1x1=CCM, 1x1+3x3=ICCM,
    3x3+3x3=DCCM (reference plksr_arch.py:24-58)."""
    k0 = sd[f"{tp}.{t_mix}.0.weight"].shape[-1]
    k2 = sd[f"{tp}.{t_mix}.2.weight"].shape[-1]
    if k0 == 3 and k2 == 3:
        return "DCCM_0"
    return "CCM_0" if k0 == 3 else "ICCM_0"


def _convert_plksr_family(
    sd: dict[str, np.ndarray], mixer_attr: str, block_cls: str
) -> dict[str, np.ndarray]:
    """feats.0 head conv, feats.1..N blocks, last plain conv is the tail;
    realplksr additionally has Dropout2d (no params) and optional DySample."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    block_idx = {}
    plain = []
    for key in sd:
        m = re.match(r"feats\.(\d+)\.", key)
        if not m:
            continue
        i = int(m.group(1))
        if re.fullmatch(rf"feats\.{i}\.(weight|bias)", key):
            if i not in plain:
                plain.append(i)
        else:
            block_idx[i] = True
    for n, i in enumerate(sorted(block_idx)):
        tp = f"feats.{i}"
        scope = f"{block_cls}_{n}"
        o_mix = _ccm_module_name(sd, tp, mixer_attr)
        _plk_block(out, scope, sd, tp, used, (mixer_attr, o_mix))
    for our, i in zip(("Conv2d_0", "Conv2d_1"), sorted(plain)):
        _put_conv(out, our, sd, f"feats.{i}", used)
    if "to_img.offset.weight" in sd:
        _dysample(out, "DySample_0", sd, "to_img", used)
    return out


def convert_plksr(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    return _convert_plksr_family(sd, "channe_mixer", "PLKBlock")


def convert_realplksr(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    return _convert_plksr_family(sd, "channel_mixer", "RealPLKBlock")


def convert_spanplus(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """feats.0 Conv3XC stem + feats.{i} SPABS stages; upsampler is DySample
    ('dys'), conv+PixelShuffle ('ps'), or plain conv ('conv', 1x)
    (reference spanplus_arch.py:196-222)."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    _conv3xc(out, "Conv3XC_0", sd, "feats.0", used)
    stages = sorted({
        int(m.group(1))
        for key in sd
        if (m := re.match(r"feats\.([1-9]\d*)\.", key))
    })
    def spab(scope: str, tp: str) -> None:
        for j in range(3):
            _conv3xc(out, f"{scope}.Conv3XC_{j}", sd, f"{tp}.c{j + 1}_r", used)

    for n, i in enumerate(stages):
        tp, scope = f"feats.{i}", f"SPABS_{n}"
        spab(f"{scope}.SPABPlus_0", f"{tp}.block_1")
        inner = sorted({
            int(m.group(1))
            for key in sd
            if (m := re.match(rf"feats\.{i}\.block_n\.(\d+)\.", key))
        })
        for j in inner:
            spab(f"{scope}.SPABPlus_{j + 1}", f"{tp}.block_n.{j}")
        spab(f"{scope}.SPABPlus_{len(inner) + 1}", f"{tp}.block_end")
        _conv3xc(out, f"{scope}.Conv3XC_0", sd, f"{tp}.conv_2", used)
        _put_conv(out, f"{scope}.Conv2d_0", sd, f"{tp}.conv_cat", used)
    if "upsampler.offset.weight" in sd:
        _dysample(out, "DySample_0", sd, "upsampler", used)
    elif "upsampler.0.weight" in sd:
        _put_conv(out, "Conv2d_0", sd, "upsampler.0", used)
    elif "upsampler.weight" in sd:
        _put_conv(out, "Conv2d_0", sd, "upsampler", used)
    return out


def _put_dense(out: dict, scope: str, sd: dict, tp: str, used: set) -> None:
    """torch Linear (out,in) -> flax Dense kernel (in,out)."""
    out[f"{scope}.kernel"] = np.ascontiguousarray(sd[f"{tp}.weight"].T)
    used.add(f"{tp}.weight")
    bias = sd.get(f"{tp}.bias")
    if bias is not None:
        out[f"{scope}.bias"] = bias
        used.add(f"{tp}.bias")


def _put_ln(out: dict, scope: str, sd: dict, tp: str, used: set) -> None:
    out[f"{scope}.scale"] = sd[f"{tp}.weight"]
    out[f"{scope}.bias"] = sd[f"{tp}.bias"]
    used.update((f"{tp}.weight", f"{tp}.bias"))


def convert_swinir(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """SwinIR (reference swinir_arch.py): layers.{i}.residual_group.blocks.{j}
    -> RSTB_{i}.SwinBlock_{j}; derived buffers (relative_position_index,
    attn_mask) are skipped. Handles the three registered upsampler variants:
    pixelshuffledirect (small), pixelshuffle (medium), nearest+conv (large,
    with 3conv residual blocks)."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()

    _put_conv(out, "Conv2d_0", sd, "conv_first", used)
    if "patch_embed.norm.weight" in sd:
        _put_ln(out, "LayerNorm_0", sd, "patch_embed.norm", used)

    blocks: dict[tuple[int, int], bool] = {}
    layer_convs: dict[int, list[int | None]] = {}
    for key in sd:
        m = re.match(r"layers\.(\d+)\.residual_group\.blocks\.(\d+)\.", key)
        if m:
            blocks[(int(m.group(1)), int(m.group(2)))] = True
        m = re.match(r"layers\.(\d+)\.conv\.(?:(\d+)\.)?weight$", key)
        if m:
            i = int(m.group(1))
            layer_convs.setdefault(i, []).append(
                int(m.group(2)) if m.group(2) else None
            )
    for (i, j) in blocks:
        tp = f"layers.{i}.residual_group.blocks.{j}"
        scope = f"RSTB_{i}.SwinBlock_{j}"
        _put_ln(out, f"{scope}.LayerNorm_0", sd, f"{tp}.norm1", used)
        _put_ln(out, f"{scope}.LayerNorm_1", sd, f"{tp}.norm2", used)
        attn = f"{scope}.WindowAttention_0"
        _put_dense(out, f"{attn}.Dense_0", sd, f"{tp}.attn.qkv", used)
        _put_dense(out, f"{attn}.Dense_1", sd, f"{tp}.attn.proj", used)
        out[f"{attn}.relative_position_bias_table"] = sd[
            f"{tp}.attn.relative_position_bias_table"
        ]
        _put_dense(out, f"{scope}.Mlp_0.Dense_0", sd, f"{tp}.mlp.fc1", used)
        _put_dense(out, f"{scope}.Mlp_0.Dense_1", sd, f"{tp}.mlp.fc2", used)
    for i, subs in layer_convs.items():
        if subs == [None]:  # 1conv residual
            _put_conv(out, f"RSTB_{i}.Conv2d_0", sd, f"layers.{i}.conv", used)
        else:  # 3conv residual (conv.0 / conv.2 / conv.4)
            for n, s in enumerate(sorted(x for x in subs if x is not None)):
                _put_conv(out, f"RSTB_{i}.Conv2d_{n}", sd, f"layers.{i}.conv.{s}", used)

    _put_ln(out, "LayerNorm_1", sd, "norm", used)

    nc = 1  # next top-level Conv2d index (construction order)
    if "conv_after_body.weight" in sd:
        _put_conv(out, f"Conv2d_{nc}", sd, "conv_after_body", used)
        nc += 1
    else:  # 3conv body tail (large preset)
        for s in (0, 2, 4):
            _put_conv(out, f"Conv2d_{nc}", sd, f"conv_after_body.{s}", used)
            nc += 1

    if "conv_up1.weight" in sd:  # nearest+conv head
        _put_conv(out, f"Conv2d_{nc}", sd, "conv_before_upsample.0", used)
        for tp in ("conv_up1", "conv_up2", "conv_hr", "conv_last"):
            nc += 1
            _put_conv(out, f"Conv2d_{nc}", sd, tp, used)
    elif "conv_before_upsample.0.weight" in sd:  # pixelshuffle head
        _put_conv(out, f"Conv2d_{nc}", sd, "conv_before_upsample.0", used)
        ups = sorted(
            int(m.group(1))
            for key in sd
            if (m := re.fullmatch(r"upsample\.(\d+)\.weight", key))
        )
        for n, s in enumerate(ups):
            _put_conv(out, f"Upsample_0.Conv2d_{n}", sd, f"upsample.{s}", used)
        _put_conv(out, f"Conv2d_{nc + 1}", sd, "conv_last", used)
    else:  # pixelshuffledirect head
        _put_conv(out, f"Conv2d_{nc}", sd, "upsample.0", used)
    return out


def convert_hat(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """HAT (reference hat_arch.py): swin skeleton + CAB channel-attention
    conv blocks per HAB and one OCAB (overlapping cross-attention) per
    group; pixelshuffle head only (hat_arch.py:998-1008)."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()

    _put_conv(out, "Conv2d_0", sd, "conv_first", used)
    if "patch_embed.norm.weight" in sd:
        _put_ln(out, "LayerNorm_0", sd, "patch_embed.norm", used)

    def attn_block(scope: str, tp: str) -> None:
        _put_ln(out, f"{scope}.LayerNorm_0", sd, f"{tp}.norm1", used)
        _put_ln(out, f"{scope}.LayerNorm_1", sd, f"{tp}.norm2", used)
        _put_dense(out, f"{scope}.Mlp_0.Dense_0", sd, f"{tp}.mlp.fc1", used)
        _put_dense(out, f"{scope}.Mlp_0.Dense_1", sd, f"{tp}.mlp.fc2", used)

    for key in list(sd):
        m = re.match(r"layers\.(\d+)\.residual_group\.blocks\.(\d+)\.norm1\.weight$", key)
        if m:
            i, j = int(m.group(1)), int(m.group(2))
            tp = f"layers.{i}.residual_group.blocks.{j}"
            scope = f"RHAG_{i}.HAB_{j}"
            attn_block(scope, tp)
            wa = f"{scope}.WindowAttention_0"
            _put_dense(out, f"{wa}.Dense_0", sd, f"{tp}.attn.qkv", used)
            _put_dense(out, f"{wa}.Dense_1", sd, f"{tp}.attn.proj", used)
            out[f"{wa}.relative_position_bias_table"] = sd[
                f"{tp}.attn.relative_position_bias_table"
            ]
            cab = f"{scope}.CAB_0"
            _put_conv(out, f"{cab}.Conv2d_0", sd, f"{tp}.conv_block.cab.0", used)
            _put_conv(out, f"{cab}.Conv2d_1", sd, f"{tp}.conv_block.cab.2", used)
            ca = f"{cab}.ChannelAttention_0"
            _put_conv(out, f"{ca}.Conv2d_0", sd, f"{tp}.conv_block.cab.3.attention.1", used)
            _put_conv(out, f"{ca}.Conv2d_1", sd, f"{tp}.conv_block.cab.3.attention.3", used)
            continue
        m = re.match(r"layers\.(\d+)\.residual_group\.overlap_attn\.norm1\.weight$", key)
        if m:
            i = int(m.group(1))
            tp = f"layers.{i}.residual_group.overlap_attn"
            scope = f"RHAG_{i}.OCAB_0"
            attn_block(scope, tp)
            _put_dense(out, f"{scope}.Dense_0", sd, f"{tp}.qkv", used)
            _put_dense(out, f"{scope}.Dense_1", sd, f"{tp}.proj", used)
            out[f"{scope}.relative_position_bias_table"] = sd[
                f"{tp}.relative_position_bias_table"
            ]
            continue
        m = re.fullmatch(r"layers\.(\d+)\.conv\.weight", key)
        if m:
            _put_conv(out, f"RHAG_{m.group(1)}.Conv2d_0", sd,
                      f"layers.{m.group(1)}.conv", used)

    _put_ln(out, "LayerNorm_1", sd, "norm", used)
    _put_conv(out, "Conv2d_1", sd, "conv_after_body", used)
    _put_conv(out, "Conv2d_2", sd, "conv_before_upsample.0", used)
    ups = sorted(
        int(m.group(1))
        for key in sd
        if (m := re.fullmatch(r"upsample\.(\d+)\.weight", key))
    )
    for n, s in enumerate(ups):
        _put_conv(out, f"Upsample_0.Conv2d_{n}", sd, f"upsample.{s}", used)
    _put_conv(out, "Conv2d_3", sd, "conv_last", used)
    return out


def convert_atd(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """ATD (reference atd_arch.py): per layer a token dictionary `td`, and
    per transformer block SW-MSA (shared wqkv), token-dictionary
    cross-attention (wq/wk/wv + temperature scale), category-sorted AC-MSA
    (logit_scale + proj), ConvFFN with depthwise conv, and the td refinement
    (sigma + affine InstanceNorm1d as norm3)."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()

    _put_conv(out, "Conv2d_0", sd, "conv_first", used)
    if "patch_embed.norm.weight" in sd:
        _put_ln(out, "LayerNorm_0", sd, "patch_embed.norm", used)

    for key in list(sd):
        m = re.fullmatch(r"layers\.(\d+)\.residual_group\.td", key)
        if m:
            out[f"ATDB_{m.group(1)}.td"] = sd[key]
            continue
        m = re.fullmatch(r"layers\.(\d+)\.conv\.weight", key)
        if m:
            _put_conv(out, f"ATDB_{m.group(1)}.Conv2d_0", sd,
                      f"layers.{m.group(1)}.conv", used)
            continue
        m = re.match(r"layers\.(\d+)\.residual_group\.layers\.(\d+)\.norm1\.weight$", key)
        if not m:
            continue
        i, j = int(m.group(1)), int(m.group(2))
        tp = f"layers.{i}.residual_group.layers.{j}"
        scope = f"ATDB_{i}.ATDTransformerLayer_{j}"
        _put_ln(out, f"{scope}.LayerNorm_0", sd, f"{tp}.norm1", used)
        _put_ln(out, f"{scope}.LayerNorm_1", sd, f"{tp}.norm2", used)
        _put_dense(out, f"{scope}.Dense_0", sd, f"{tp}.wqkv", used)
        wa = f"{scope}.WindowAttentionQKV_0"
        out[f"{wa}.relative_position_bias_table"] = sd[
            f"{tp}.attn_win.relative_position_bias_table"
        ]
        _put_dense(out, f"{wa}.Dense_0", sd, f"{tp}.attn_win.proj", used)
        ca = f"{scope}.ATD_CA_0"
        _put_dense(out, f"{ca}.Dense_0", sd, f"{tp}.attn_atd.wq", used)
        _put_dense(out, f"{ca}.Dense_1", sd, f"{tp}.attn_atd.wk", used)
        _put_dense(out, f"{ca}.Dense_2", sd, f"{tp}.attn_atd.wv", used)
        out[f"{ca}.scale"] = sd[f"{tp}.attn_atd.scale"]
        aca = f"{scope}.AC_MSA_0"
        _put_dense(out, f"{aca}.Dense_0", sd, f"{tp}.attn_aca.proj", used)
        out[f"{aca}.logit_scale"] = sd[f"{tp}.attn_aca.logit_scale"]
        ffn = f"{scope}.ConvFFN_0"
        _put_dense(out, f"{ffn}.Dense_0", sd, f"{tp}.convffn.fc1", used)
        _put_dense(out, f"{ffn}.Dense_1", sd, f"{tp}.convffn.fc2", used)
        out[f"{ffn}.Conv_0.kernel"] = _k(sd[f"{tp}.convffn.dwconv.depthwise_conv.0.weight"])
        out[f"{ffn}.Conv_0.bias"] = sd[f"{tp}.convffn.dwconv.depthwise_conv.0.bias"]
        if f"{tp}.sigma" in sd:  # absent on each group's last layer
            out[f"{scope}.sigma"] = sd[f"{tp}.sigma"]
            out[f"{scope}.InstanceNorm1dAffine_0.scale"] = sd[
                f"{tp}.norm3.weight"
            ].reshape(-1, 1)
            out[f"{scope}.InstanceNorm1dAffine_0.bias"] = sd[
                f"{tp}.norm3.bias"
            ].reshape(-1, 1)

    _put_ln(out, "LayerNorm_1", sd, "norm", used)
    _put_conv(out, "Conv2d_1", sd, "conv_after_body", used)
    if "conv_before_upsample.0.weight" in sd:
        _put_conv(out, "Conv2d_2", sd, "conv_before_upsample.0", used)
        ups = sorted(
            int(m.group(1))
            for key in sd
            if (m := re.fullmatch(r"upsample\.(\d+)\.weight", key))
        )
        for n, s in enumerate(ups):
            _put_conv(out, f"Upsample_0.Conv2d_{n}", sd, f"upsample.{s}", used)
        _put_conv(out, "Conv2d_3", sd, "conv_last", used)
    else:  # pixelshuffledirect (atd_light)
        _put_conv(out, "Conv2d_2", sd, "upsample.0", used)
    return out


CONVERTERS: dict[str, Callable[[dict], dict]] = {
    "compact": convert_compact,
    "esrgan": convert_esrgan,
    "span": convert_span,
    "plksr": convert_plksr,
    "realplksr": convert_realplksr,
    "spanplus": convert_spanplus,
    "swinir": convert_swinir,
    "hat": convert_hat,
    "atd": convert_atd,
}


def _all_converters() -> dict[str, Callable[[dict], dict]]:
    """Core converters + the extended-zoo set (lazy import: the ext module
    imports helpers from this one)."""
    from neosr_tpu.utils.torch_interop_ext import EXT_CONVERTERS

    return {**CONVERTERS, **EXT_CONVERTERS}


def family(arch_type: str) -> str | None:
    """Map a registered preset name (e.g. plksr_tiny, spanplus_sts) to its
    converter family; longest match wins (spanplus_* is not span_*,
    light_safmnpp is not safmn_*)."""
    converters = _all_converters()
    for fam in sorted(converters, key=len, reverse=True):
        if arch_type == fam or arch_type.startswith(fam + "_"):
            return fam
    return None


# converters emit BN running statistics under this flat-key prefix; the
# loader splits them into the flax "batch_stats" collection
BATCH_STATS_PREFIX = "batch_stats::"


def convert_state_dict(
    sd: dict[str, Any], arch_type: str, scale: int = 4,
    with_stats: bool = False,
) -> dict[str, Any] | tuple[dict[str, Any], dict[str, Any] | None]:
    """Flat torch state_dict -> nested flax param tree for `arch_type`.
    `scale` disambiguates converters whose mapping depends on the upsampler
    stage actually in use (msdan).  With `with_stats`, also returns the
    BN running statistics as a nested "batch_stats"-collection tree (None
    when the arch has no BN)."""
    converters = _all_converters()
    fam = family(arch_type)
    if fam is None:
        supported = ", ".join(sorted(converters))
        msg = (
            f"No torch-checkpoint converter for arch '{arch_type}' "
            f"(supported: {supported}). Re-export via convert.py instead."
        )
        raise ValueError(msg)
    sd_np = {k: np.asarray(v) for k, v in sd.items()}
    if fam == "msdan":
        flat = converters[fam](sd_np, scale=scale)
    else:
        flat = converters[fam](sd_np)
    stats_flat = {
        k[len(BATCH_STATS_PREFIX):]: v
        for k, v in flat.items() if k.startswith(BATCH_STATS_PREFIX)
    }
    flat = {k: v for k, v in flat.items() if not k.startswith(BATCH_STATS_PREFIX)}
    params = unflatten_params(flat)
    if with_stats:
        return params, (unflatten_params(stats_flat) if stats_flat else None)
    return params


# --------------------------------------------------------------- export
# Inverse direction: our flax params -> reference torch key layout, so
# models trained here load into the existing ecosystem (chaiNNer/spandrel
# read these layouts; reference load format base.py:385-394).


def _ik(w: np.ndarray) -> np.ndarray:
    """Conv kernel HWIO (flax) -> OIHW (torch)."""
    return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))


def _get_conv(flat: dict, scope: str, out: dict, torch_prefix: str) -> None:
    out[f"{torch_prefix}.weight"] = _ik(flat[f"{scope}.Conv_0.kernel"])
    bias = flat.get(f"{scope}.Conv_0.bias")
    if bias is not None:
        out[f"{torch_prefix}.bias"] = bias


def _fuse_conv3xc(flat: dict, scope: str) -> tuple[np.ndarray, np.ndarray]:
    """Fold sk + 1x1/3x3/1x1 into the single 3x3 the reference derives as
    eval_conv (span_arch.py:143-179) — exported so strict loads succeed and
    deploy-path inference needs no conversion step."""
    k1 = _ik(flat[f"{scope}.Conv2d_1.Conv_0.kernel"])  # (I2, C, 1, 1)
    b1 = flat[f"{scope}.Conv2d_1.Conv_0.bias"]
    k2 = _ik(flat[f"{scope}.Conv2d_2.Conv_0.kernel"])  # (O2, I2, 3, 3)
    b2 = flat[f"{scope}.Conv2d_2.Conv_0.bias"]
    k3 = _ik(flat[f"{scope}.Conv2d_3.Conv_0.kernel"])  # (O, O2, 1, 1)
    b3 = flat[f"{scope}.Conv2d_3.Conv_0.bias"]
    sk = _ik(flat[f"{scope}.Conv2d_0.Conv_0.kernel"])  # (O, C, 1, 1)
    sb = flat[f"{scope}.Conv2d_0.Conv_0.bias"]

    k12 = np.einsum("oihw,icxy->ochw", k2, k1)
    b12 = np.einsum("oihw,i->o", k2, b1) + b2
    k = np.einsum("poxy,ochw->pchw", k3, k12)
    b = np.einsum("poxy,o->p", k3, b12).reshape(-1) + b3
    k[:, :, 1:2, 1:2] += sk
    b = b + sb
    return k.astype(np.float32), b.astype(np.float32)


def _export_conv3xc(flat: dict, scope: str, out: dict, tp: str) -> None:
    for o_sub, t_sub in (
        ("Conv2d_0", "sk"),
        ("Conv2d_1", "conv.0"),
        ("Conv2d_2", "conv.1"),
        ("Conv2d_3", "conv.2"),
    ):
        _get_conv(flat, f"{scope}.{o_sub}", out, f"{tp}.{t_sub}")
    k, b = _fuse_conv3xc(flat, scope)
    out[f"{tp}.eval_conv.weight"] = k
    out[f"{tp}.eval_conv.bias"] = b


def export_compact(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for key, val in flat.items():
        m = re.match(r"Conv2d_(\d+)\.Conv_0\.(kernel|bias)", key)
        if m:
            i, kind = int(m.group(1)), m.group(2)
            name = "weight" if kind == "kernel" else "bias"
            out[f"body.{2 * i}.{name}"] = _ik(val) if kind == "kernel" else val
            continue
        m = re.match(r"PReLU_(\d+)\.alpha", key)
        if m:
            out[f"body.{2 * int(m.group(1)) + 1}.weight"] = val
    return out


def export_esrgan(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    inv_top = {v: k for k, v in _ESRGAN_TOP.items()}
    for scope in {k.rsplit(".Conv_0.", 1)[0] for k in flat if ".Conv_0." in k}:
        m = re.fullmatch(r"RRDB_(\d+)\.ResidualDenseBlock_(\d)\.Conv2d_(\d)", scope)
        if m:
            i, j, k = (int(g) for g in m.groups())
            _get_conv(flat, scope, out, f"body.{i}.rdb{j + 1}.conv{k + 1}")
        elif scope in inv_top:
            _get_conv(flat, scope, out, inv_top[scope])
    return out


def export_span(flat: dict[str, np.ndarray], norm: bool = False,
                **_: Any) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if not norm:
        # norm=False registers a `no_norm` marker buffer (span_arch.py:248-252)
        out["no_norm"] = np.zeros(1, np.float32)
    _export_conv3xc(flat, "Conv3XC_0", out, "conv_1")
    for i in range(1, 7):
        for j in range(1, 4):
            _export_conv3xc(flat, f"SPAB_{i - 1}.Conv3XC_{j - 1}", out,
                            f"block_{i}.c{j}_r")
    _export_conv3xc(flat, "Conv3XC_1", out, "conv_2")
    _get_conv(flat, "Conv2d_0", out, "conv_cat")
    _get_conv(flat, "Conv2d_1", out, "upsampler.0")
    return out


def _get_dense(flat: dict, scope: str, out: dict, tp: str) -> None:
    out[f"{tp}.weight"] = np.ascontiguousarray(flat[f"{scope}.kernel"].T)
    bias = flat.get(f"{scope}.bias")
    if bias is not None:
        out[f"{tp}.bias"] = bias


def _get_ln(flat: dict, scope: str, out: dict, tp: str) -> None:
    out[f"{tp}.weight"] = flat[f"{scope}.scale"]
    out[f"{tp}.bias"] = flat[f"{scope}.bias"]


def export_swinir(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_swinir.  Derived torch buffers
    (relative_position_index, attn_mask) are NOT emitted — the torch model
    computes them in __init__, so a strict=False load is complete."""
    out: dict[str, np.ndarray] = {}
    _get_conv(flat, "Conv2d_0", out, "conv_first")
    if "LayerNorm_0.scale" in flat:
        _get_ln(flat, "LayerNorm_0", out, "patch_embed.norm")
    _get_ln(flat, "LayerNorm_1", out, "norm")

    for key in flat:
        m = re.fullmatch(r"RSTB_(\d+)\.SwinBlock_(\d+)\.LayerNorm_0\.scale", key)
        if m:
            i, j = m.groups()
            scope = f"RSTB_{i}.SwinBlock_{j}"
            tp = f"layers.{i}.residual_group.blocks.{j}"
            _get_ln(flat, f"{scope}.LayerNorm_0", out, f"{tp}.norm1")
            _get_ln(flat, f"{scope}.LayerNorm_1", out, f"{tp}.norm2")
            _get_dense(flat, f"{scope}.WindowAttention_0.Dense_0", out, f"{tp}.attn.qkv")
            _get_dense(flat, f"{scope}.WindowAttention_0.Dense_1", out, f"{tp}.attn.proj")
            out[f"{tp}.attn.relative_position_bias_table"] = flat[
                f"{scope}.WindowAttention_0.relative_position_bias_table"
            ]
            _get_dense(flat, f"{scope}.Mlp_0.Dense_0", out, f"{tp}.mlp.fc1")
            _get_dense(flat, f"{scope}.Mlp_0.Dense_1", out, f"{tp}.mlp.fc2")
            continue
        m = re.fullmatch(r"RSTB_(\d+)\.Conv2d_(\d)\.Conv_0\.kernel", key)
        if m:
            i, k = m.groups()
            if f"RSTB_{i}.Conv2d_1.Conv_0.kernel" in flat:  # 3conv residual
                _get_conv(flat, f"RSTB_{i}.Conv2d_{k}", out,
                          f"layers.{i}.conv.{2 * int(k)}")
            else:
                _get_conv(flat, f"RSTB_{i}.Conv2d_0", out, f"layers.{i}.conv")

    tops = sorted(
        int(m.group(1))
        for key in flat
        if (m := re.fullmatch(r"Conv2d_(\d+)\.Conv_0\.kernel", key))
    )
    n_top = len(tops)
    if "Upsample_0.Conv2d_0.Conv_0.kernel" in flat:  # pixelshuffle head
        for our, tp in (("Conv2d_1", "conv_after_body"),
                        ("Conv2d_2", "conv_before_upsample.0"),
                        ("Conv2d_3", "conv_last")):
            _get_conv(flat, our, out, tp)
        k = 0
        while f"Upsample_0.Conv2d_{k}.Conv_0.kernel" in flat:
            _get_conv(flat, f"Upsample_0.Conv2d_{k}", out, f"upsample.{2 * k}")
            k += 1
    elif n_top >= 9:  # nearest+conv large head (3conv body tail)
        for n, tp in enumerate((
            "conv_after_body.0", "conv_after_body.2", "conv_after_body.4",
            "conv_before_upsample.0", "conv_up1", "conv_up2", "conv_hr",
            "conv_last",
        ), start=1):
            _get_conv(flat, f"Conv2d_{n}", out, tp)
    else:  # pixelshuffledirect
        _get_conv(flat, "Conv2d_1", out, "conv_after_body")
        _get_conv(flat, "Conv2d_2", out, "upsample.0")
    return out


def export_hat(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_hat: our HAT params -> reference hat_arch layout
    (derived buffers relative_position_index / attn_mask not emitted)."""
    out: dict[str, np.ndarray] = {}
    _get_conv(flat, "Conv2d_0", out, "conv_first")
    if "LayerNorm_0.scale" in flat:
        _get_ln(flat, "LayerNorm_0", out, "patch_embed.norm")
    _get_ln(flat, "LayerNorm_1", out, "norm")

    for key in flat:
        m = re.fullmatch(r"RHAG_(\d+)\.HAB_(\d+)\.LayerNorm_0\.scale", key)
        if m:
            i, j = m.groups()
            scope = f"RHAG_{i}.HAB_{j}"
            tp = f"layers.{i}.residual_group.blocks.{j}"
            _get_ln(flat, f"{scope}.LayerNorm_0", out, f"{tp}.norm1")
            _get_ln(flat, f"{scope}.LayerNorm_1", out, f"{tp}.norm2")
            wa = f"{scope}.WindowAttention_0"
            _get_dense(flat, f"{wa}.Dense_0", out, f"{tp}.attn.qkv")
            _get_dense(flat, f"{wa}.Dense_1", out, f"{tp}.attn.proj")
            out[f"{tp}.attn.relative_position_bias_table"] = flat[
                f"{wa}.relative_position_bias_table"]
            cab = f"{scope}.CAB_0"
            _get_conv(flat, f"{cab}.Conv2d_0", out, f"{tp}.conv_block.cab.0")
            _get_conv(flat, f"{cab}.Conv2d_1", out, f"{tp}.conv_block.cab.2")
            ca = f"{cab}.ChannelAttention_0"
            _get_conv(flat, f"{ca}.Conv2d_0", out, f"{tp}.conv_block.cab.3.attention.1")
            _get_conv(flat, f"{ca}.Conv2d_1", out, f"{tp}.conv_block.cab.3.attention.3")
            _get_dense(flat, f"{scope}.Mlp_0.Dense_0", out, f"{tp}.mlp.fc1")
            _get_dense(flat, f"{scope}.Mlp_0.Dense_1", out, f"{tp}.mlp.fc2")
            continue
        m = re.fullmatch(r"RHAG_(\d+)\.OCAB_0\.LayerNorm_0\.scale", key)
        if m:
            i = m.group(1)
            scope = f"RHAG_{i}.OCAB_0"
            tp = f"layers.{i}.residual_group.overlap_attn"
            _get_ln(flat, f"{scope}.LayerNorm_0", out, f"{tp}.norm1")
            _get_ln(flat, f"{scope}.LayerNorm_1", out, f"{tp}.norm2")
            _get_dense(flat, f"{scope}.Dense_0", out, f"{tp}.qkv")
            _get_dense(flat, f"{scope}.Dense_1", out, f"{tp}.proj")
            out[f"{tp}.relative_position_bias_table"] = flat[
                f"{scope}.relative_position_bias_table"]
            _get_dense(flat, f"{scope}.Mlp_0.Dense_0", out, f"{tp}.mlp.fc1")
            _get_dense(flat, f"{scope}.Mlp_0.Dense_1", out, f"{tp}.mlp.fc2")
            continue
        m = re.fullmatch(r"RHAG_(\d+)\.Conv2d_0\.Conv_0\.kernel", key)
        if m:
            _get_conv(flat, f"RHAG_{m.group(1)}.Conv2d_0", out,
                      f"layers.{m.group(1)}.conv")

    _get_conv(flat, "Conv2d_1", out, "conv_after_body")
    _get_conv(flat, "Conv2d_2", out, "conv_before_upsample.0")
    k = 0
    while f"Upsample_0.Conv2d_{k}.Conv_0.kernel" in flat:
        _get_conv(flat, f"Upsample_0.Conv2d_{k}", out, f"upsample.{2 * k}")
        k += 1
    _get_conv(flat, "Conv2d_3", out, "conv_last")
    return out


def export_atd(flat: dict[str, np.ndarray], norm: bool = False,
               **_: Any) -> dict[str, np.ndarray]:
    """Inverse of convert_atd.  norm=False (the reference default) registers
    a `no_norm` marker buffer (atd_arch.py)."""
    out: dict[str, np.ndarray] = {}
    if not norm:
        out["no_norm"] = np.zeros(1, np.float32)
    _get_conv(flat, "Conv2d_0", out, "conv_first")
    if "LayerNorm_0.scale" in flat:
        _get_ln(flat, "LayerNorm_0", out, "patch_embed.norm")
    _get_ln(flat, "LayerNorm_1", out, "norm")

    for key in flat:
        m = re.fullmatch(r"ATDB_(\d+)\.td", key)
        if m:
            out[f"layers.{m.group(1)}.residual_group.td"] = flat[key]
            continue
        m = re.fullmatch(r"ATDB_(\d+)\.Conv2d_0\.Conv_0\.kernel", key)
        if m:
            _get_conv(flat, f"ATDB_{m.group(1)}.Conv2d_0", out,
                      f"layers.{m.group(1)}.conv")
            continue
        m = re.fullmatch(
            r"ATDB_(\d+)\.ATDTransformerLayer_(\d+)\.LayerNorm_0\.scale", key)
        if not m:
            continue
        i, j = m.groups()
        scope = f"ATDB_{i}.ATDTransformerLayer_{j}"
        tp = f"layers.{i}.residual_group.layers.{j}"
        _get_ln(flat, f"{scope}.LayerNorm_0", out, f"{tp}.norm1")
        _get_ln(flat, f"{scope}.LayerNorm_1", out, f"{tp}.norm2")
        _get_dense(flat, f"{scope}.Dense_0", out, f"{tp}.wqkv")
        wa = f"{scope}.WindowAttentionQKV_0"
        out[f"{tp}.attn_win.relative_position_bias_table"] = flat[
            f"{wa}.relative_position_bias_table"]
        _get_dense(flat, f"{wa}.Dense_0", out, f"{tp}.attn_win.proj")
        ca = f"{scope}.ATD_CA_0"
        _get_dense(flat, f"{ca}.Dense_0", out, f"{tp}.attn_atd.wq")
        _get_dense(flat, f"{ca}.Dense_1", out, f"{tp}.attn_atd.wk")
        _get_dense(flat, f"{ca}.Dense_2", out, f"{tp}.attn_atd.wv")
        out[f"{tp}.attn_atd.scale"] = flat[f"{ca}.scale"]
        aca = f"{scope}.AC_MSA_0"
        _get_dense(flat, f"{aca}.Dense_0", out, f"{tp}.attn_aca.proj")
        out[f"{tp}.attn_aca.logit_scale"] = flat[f"{aca}.logit_scale"]
        ffn = f"{scope}.ConvFFN_0"
        _get_dense(flat, f"{ffn}.Dense_0", out, f"{tp}.convffn.fc1")
        _get_dense(flat, f"{ffn}.Dense_1", out, f"{tp}.convffn.fc2")
        out[f"{tp}.convffn.dwconv.depthwise_conv.0.weight"] = _ik(
            flat[f"{ffn}.Conv_0.kernel"])
        out[f"{tp}.convffn.dwconv.depthwise_conv.0.bias"] = flat[f"{ffn}.Conv_0.bias"]
        if f"{scope}.sigma" in flat:
            out[f"{tp}.sigma"] = flat[f"{scope}.sigma"]
            out[f"{tp}.norm3.weight"] = flat[
                f"{scope}.InstanceNorm1dAffine_0.scale"].reshape(-1)
            out[f"{tp}.norm3.bias"] = flat[
                f"{scope}.InstanceNorm1dAffine_0.bias"].reshape(-1)

    _get_conv(flat, "Conv2d_1", out, "conv_after_body")
    if "Upsample_0.Conv2d_0.Conv_0.kernel" in flat:  # pixelshuffle head
        _get_conv(flat, "Conv2d_2", out, "conv_before_upsample.0")
        k = 0
        while f"Upsample_0.Conv2d_{k}.Conv_0.kernel" in flat:
            _get_conv(flat, f"Upsample_0.Conv2d_{k}", out, f"upsample.{2 * k}")
            k += 1
        _get_conv(flat, "Conv2d_3", out, "conv_last")
    else:  # pixelshuffledirect (atd_light)
        _get_conv(flat, "Conv2d_2", out, "upsample.0")
    return out


def _get_dysample(flat: dict, scope: str, out: dict, tp: str,
                  scale: int = 2, groups: int = 4) -> None:
    """Inverse of _dysample; emits the derived init_pos buffer too so strict
    torch loads succeed (arch_util.py:62-67 layout)."""
    _get_conv(flat, f"{scope}.Conv2d_0", out, f"{tp}.offset")
    _get_conv(flat, f"{scope}.Conv2d_1", out, f"{tp}.scope")
    if f"{scope}.Conv2d_2.Conv_0.kernel" in flat:
        _get_conv(flat, f"{scope}.Conv2d_2", out, f"{tp}.end_conv")
    h = (np.arange(scale, dtype=np.float32) - (scale - 1) / 2) / scale
    gy, gx = np.meshgrid(h, h, indexing="ij")
    init = np.stack([gx, gy], axis=-1)  # (r, r, 2) in (x, y) order
    init = np.tile(init[None, :, :, None, :], (1, 1, 1, groups, 1))
    init = init.transpose(0, 4, 3, 1, 2).reshape(1, -1, 1, 1)
    out[f"{tp}.init_pos"] = init.astype(np.float32)


def export_realplksr(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_realplksr (DCCM mixer, GroupNorm, optional
    DySample)."""
    out: dict[str, np.ndarray] = {}
    blocks = sorted({
        int(m.group(1)) for key in flat
        if (m := re.match(r"RealPLKBlock_(\d+)\.", key))
    })
    _get_conv(flat, "Conv2d_0", out, "feats.0")
    for n in blocks:
        scope, tp = f"RealPLKBlock_{n}", f"feats.{n + 1}"
        mix = next(
            pfx for pfx in ("DCCM_0", "CCM_0", "ICCM_0")
            if f"{scope}.{pfx}.Conv2d_0.Conv_0.kernel" in flat
        )
        _get_conv(flat, f"{scope}.{mix}.Conv2d_0", out, f"{tp}.channel_mixer.0")
        _get_conv(flat, f"{scope}.{mix}.Conv2d_1", out, f"{tp}.channel_mixer.2")
        _get_conv(flat, f"{scope}.PLKConv_0.Conv2d_0", out, f"{tp}.lk.conv")
        if f"{scope}.EA_0.Conv2d_0.Conv_0.kernel" in flat:
            _get_conv(flat, f"{scope}.EA_0.Conv2d_0", out, f"{tp}.attn.f.0")
        _get_conv(flat, f"{scope}.Conv2d_0", out, f"{tp}.refine")
        out[f"{tp}.norm.weight"] = flat[f"{scope}.GroupNorm_0.scale"]
        out[f"{tp}.norm.bias"] = flat[f"{scope}.GroupNorm_0.bias"]
    _get_conv(flat, "Conv2d_1", out, f"feats.{len(blocks) + 2}")
    if "DySample_0.Conv2d_0.Conv_0.kernel" in flat:
        # DySample group count is fixed at 4 in the reference realplksr
        _get_dysample(flat, "DySample_0", out, "to_img",
                      scale=_infer_dysample_scale(flat, "DySample_0"))
    return out


def export_plksr(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_plksr (reference plksr layout: `channe_mixer`
    (sic), lk.conv | RectSparse mn/nm/nn, attn.f.0, refine; feats.0 head
    and feats.{n+1} tail plain convs)."""
    out: dict[str, np.ndarray] = {}
    blocks = sorted({
        int(m.group(1)) for key in flat
        if (m := re.match(r"PLKBlock_(\d+)\.", key))
    })
    _get_conv(flat, "Conv2d_0", out, "feats.0")
    for n in blocks:
        scope, tp = f"PLKBlock_{n}", f"feats.{n + 1}"
        mix = next(
            pfx for pfx in ("DCCM_0", "CCM_0", "ICCM_0")
            if f"{scope}.{pfx}.Conv2d_0.Conv_0.kernel" in flat
        )
        _get_conv(flat, f"{scope}.{mix}.Conv2d_0", out, f"{tp}.channe_mixer.0")
        _get_conv(flat, f"{scope}.{mix}.Conv2d_1", out, f"{tp}.channe_mixer.2")
        if f"{scope}.PLKConv_0.Conv2d_0.Conv_0.kernel" in flat:
            _get_conv(flat, f"{scope}.PLKConv_0.Conv2d_0", out, f"{tp}.lk.conv")
        elif f"{scope}.RectSparsePLKConv_0.Conv2d_0.Conv_0.kernel" in flat:
            for i, sub in enumerate(("mn_conv", "nm_conv", "nn_conv")):
                _get_conv(flat, f"{scope}.RectSparsePLKConv_0.Conv2d_{i}",
                          out, f"{tp}.lk.{sub}")
        else:
            msg = f"unsupported lk variant in {scope} (SparsePLK export)"
            raise ValueError(msg)
        if f"{scope}.EA_0.Conv2d_0.Conv_0.kernel" in flat:
            _get_conv(flat, f"{scope}.EA_0.Conv2d_0", out, f"{tp}.attn.f.0")
        _get_conv(flat, f"{scope}.Conv2d_0", out, f"{tp}.refine")
    _get_conv(flat, "Conv2d_1", out, f"feats.{len(blocks) + 1}")
    return out


def _infer_dysample_scale(flat: dict, scope: str) -> int:
    """offset conv emits 2*groups*r^2 channels with groups=4."""
    ch = flat[f"{scope}.Conv2d_0.Conv_0.kernel"].shape[-1]
    return int(round((ch / 8) ** 0.5))


def export_spanplus(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_spanplus (Conv3XC stem + SPABS stages; dys/ps/conv
    upsampler)."""
    out: dict[str, np.ndarray] = {}
    _export_conv3xc(flat, "Conv3XC_0", out, "feats.0")
    stages = sorted({
        int(m.group(1)) for key in flat
        if (m := re.match(r"SPABS_(\d+)\.", key))
    })

    def spab(scope: str, tp: str) -> None:
        for j in range(3):
            _export_conv3xc(flat, f"{scope}.Conv3XC_{j}", out, f"{tp}.c{j + 1}_r")

    for n in stages:
        scope, tp = f"SPABS_{n}", f"feats.{n + 1}"
        inner = sorted({
            int(m.group(1)) for key in flat
            if (m := re.match(rf"SPABS_{n}\.SPABPlus_(\d+)\.", key))
        })
        spab(f"{scope}.SPABPlus_0", f"{tp}.block_1")
        for j in inner[1:-1]:
            spab(f"{scope}.SPABPlus_{j}", f"{tp}.block_n.{j - 1}")
        spab(f"{scope}.SPABPlus_{inner[-1]}", f"{tp}.block_end")
        _export_conv3xc(flat, f"{scope}.Conv3XC_0", out, f"{tp}.conv_2")
        _get_conv(flat, f"{scope}.Conv2d_0", out, f"{tp}.conv_cat")
    if "DySample_0.Conv2d_0.Conv_0.kernel" in flat:
        _get_dysample(flat, "DySample_0", out, "upsampler",
                      scale=_infer_dysample_scale(flat, "DySample_0"))
    elif "Conv2d_0.Conv_0.kernel" in flat:
        _get_conv(flat, "Conv2d_0", out, "upsampler.0")
    return out


EXPORTERS: dict[str, Callable[[dict], dict]] = {
    "compact": export_compact,
    "esrgan": export_esrgan,
    "span": export_span,
    "swinir": export_swinir,
    "hat": export_hat,
    "atd": export_atd,
    "plksr": export_plksr,
    "realplksr": export_realplksr,
    "spanplus": export_spanplus,
}


def to_torch_state_dict(
    params: dict[str, Any], arch_type: str, **arch_opts: Any
) -> dict[str, np.ndarray]:
    """Our nested flax param tree -> reference-layout flat state_dict.
    `arch_opts` carries flags that shape the torch buffer set (e.g. span's
    norm -> no_norm marker)."""
    from neosr_tpu.utils.checkpoint import flatten_params

    from neosr_tpu.utils.torch_interop_ext import EXT_EXPORTERS

    exporters = {**EXPORTERS, **EXT_EXPORTERS}
    fam = family(arch_type)
    if fam is None or fam not in exporters:
        supported = ", ".join(sorted(exporters))
        msg = (
            f"No torch-layout exporter for arch '{arch_type}' "
            f"(supported: {supported}). Use safetensors/StableHLO export."
        )
        raise ValueError(msg)
    flat = {k: np.asarray(v, np.float32) for k, v in flatten_params(params).items()}
    batch_stats = arch_opts.pop("batch_stats", None)
    if batch_stats:
        # BN running statistics ride along under the same prefix the
        # importer uses, so exporters can emit running_mean/var
        flat.update({
            f"{BATCH_STATS_PREFIX}{k}": np.asarray(v, np.float32)
            for k, v in flatten_params(batch_stats).items()
        })
    if fam in ("span", "atd"):  # norm flag shapes the torch buffer set
        return exporters[fam](flat, norm=bool(arch_opts.get("norm", False)))
    return exporters[fam](flat)


def save_torch_checkpoint(
    path: str | Path, params: dict[str, Any], arch_type: str, **arch_opts: Any
) -> None:
    """Write a reference-compatible .pth ({'params': state_dict})."""
    import torch

    # copy: exported arrays may be read-only views, torch wants writable
    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in to_torch_state_dict(params, arch_type, **arch_opts).items()}
    torch.save({"params": sd}, str(path))


def load_torch_checkpoint(
    path: str | Path, arch_type: str, param_key: str = "params",
    with_stats: bool = False,
) -> Any:
    """Load a reference-format .pth and convert to our param tree.

    Accepts both wrapped ({param_key: sd}) and raw state_dicts; searches
    param keys in the reference's order (base.py:385-394).  With
    `with_stats`, returns (params, batch_stats-or-None) so BN archs keep
    their running statistics."""
    import torch

    loaded = torch.load(str(path), map_location="cpu", weights_only=True)
    for key in (param_key, *PARAM_KEYS):
        if isinstance(loaded, dict) and key in loaded:
            loaded = loaded[key]
            break
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in loaded.items()}
    return convert_state_dict(sd, arch_type, with_stats=with_stats)
