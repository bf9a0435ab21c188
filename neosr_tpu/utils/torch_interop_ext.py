"""Torch-checkpoint converters for the extended arch zoo.

Round-1 shipped converters for the 9 ecosystem-core families
(torch_interop.py); this module covers the rest of the reference zoo so
every registered generator family can import reference/openmodeldb ``.pth``
checkpoints and be forward-parity-tested against the reference torch code
(reference layouts: /root/reference/neosr/archs/*_arch.py).

Each ``convert_<fam>`` maps a flat torch state_dict (numpy values) onto our
flax auto-naming (call-order ``Conv2d_i`` / ``Conv_i`` / ``Dense_i`` /
``LayerNorm_i`` scopes).  Derived buffers (BatchNorm running stats,
relative_position_index tables, attn masks, unused parameters kept by the
reference like DITN's dead ``temperature``) are intentionally dropped.
"""

from __future__ import annotations

import re
from typing import Callable

import numpy as np

from neosr_tpu.utils.torch_interop import (
    _dysample,
    _get_dysample,
    _k,
    _put_conv,
    _put_dense,
    _put_ln,
)


def _put_scale(out: dict, key: str, sd: dict, torch_key: str, used: set) -> None:
    """(1,C,1,1) channel-scale parameter -> flat (C,)."""
    out[key] = np.asarray(sd[torch_key]).reshape(-1)
    used.add(torch_key)


def _put_raw_conv(out: dict, key_prefix: str, sd: dict, tp: str, used: set) -> None:
    """A bare nn.Conv (auto-named Conv_i, no Conv2d wrapper)."""
    out[f"{key_prefix}.kernel"] = _k(sd[f"{tp}.weight"])
    used.add(f"{tp}.weight")
    if f"{tp}.bias" in sd:
        out[f"{key_prefix}.bias"] = sd[f"{tp}.bias"]
        used.add(f"{tp}.bias")


# ---------------------------------------------------------------- man


def convert_man(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """MAN (reference man_arch.py:143-236): head/tail convs, ResGroups of
    MAB = GroupGLKA (LKA) + SGAB (LFE), LKAT tail (body_t) per group."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    _put_conv(out, "Conv2d_0", sd, "head", used)

    groups = sorted({
        int(m.group(1)) for key in sd if (m := re.match(r"body\.(\d+)\.", key))
    })
    multi = "body_t.weight" in sd  # top-level conv only when n_resgroups > 1
    for g in groups:
        gp, gs = f"body.{g}", f"ResGroup_{g}"
        blocks = sorted({
            int(m.group(1)) for key in sd
            if (m := re.match(rf"body\.{g}\.body\.(\d+)\.", key))
        })
        for b in blocks:
            # GroupGLKA (reference "LKA", man_arch.py:62-141)
            tp, sc = f"{gp}.body.{b}.LKA", f"{gs}.GroupGLKA_{b}"
            _put_ln(out, f"{sc}.LayerNorm_0", sd, f"{tp}.norm", used)
            _put_conv(out, f"{sc}.Conv2d_0", sd, f"{tp}.proj_first.0", used)
            for n, (lka, x_dw) in enumerate((("LKA3", "X3"), ("LKA5", "X5"),
                                             ("LKA7", "X7"))):
                _put_raw_conv(out, f"{sc}.Conv_{3 * n}", sd, f"{tp}.{lka}.0", used)
                _put_raw_conv(out, f"{sc}.Conv_{3 * n + 1}", sd, f"{tp}.{lka}.1", used)
                _put_conv(out, f"{sc}.Conv2d_{n + 1}", sd, f"{tp}.{lka}.2", used)
                _put_raw_conv(out, f"{sc}.Conv_{3 * n + 2}", sd, f"{tp}.{x_dw}", used)
            _put_conv(out, f"{sc}.Conv2d_4", sd, f"{tp}.proj_last.0", used)
            _put_scale(out, f"{sc}.ChannelScale_0.scale", sd, f"{tp}.scale", used)
            # SGAB (reference "LFE", man_arch.py:42-60)
            tp, sc = f"{gp}.body.{b}.LFE", f"{gs}.SGAB_{b}"
            _put_ln(out, f"{sc}.LayerNorm_0", sd, f"{tp}.norm", used)
            _put_conv(out, f"{sc}.Conv2d_0", sd, f"{tp}.Conv1", used)
            _put_raw_conv(out, f"{sc}.Conv_0", sd, f"{tp}.DWConv1", used)
            _put_conv(out, f"{sc}.Conv2d_1", sd, f"{tp}.Conv2", used)
            _put_scale(out, f"{sc}.ChannelScale_0.scale", sd, f"{tp}.scale", used)
        # LKAT (reference man_arch.py:156-182)
        tp, sc = f"{gp}.body_t", f"{gs}.LKAT_0"
        _put_conv(out, f"{sc}.Conv2d_0", sd, f"{tp}.conv0.0", used)
        _put_raw_conv(out, f"{sc}.Conv_0", sd, f"{tp}.att.0", used)
        _put_raw_conv(out, f"{sc}.Conv_1", sd, f"{tp}.att.1", used)
        _put_conv(out, f"{sc}.Conv2d_1", sd, f"{tp}.att.2", used)
        _put_conv(out, f"{sc}.Conv2d_2", sd, f"{tp}.conv1", used)

    if multi:
        _put_conv(out, "Conv2d_1", sd, "body_t", used)
        _put_conv(out, "Conv2d_2", sd, "tail.0", used)
    else:
        _put_conv(out, "Conv2d_1", sd, "tail.0", used)
    return out


# ---------------------------------------------------------------- mosr


def convert_mosr(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """MOSR (reference mosr_arch.py:12-204): gblocks Sequential = stem conv,
    n GatedCNNBlocks, conv(2C)/Mish/conv(C)/Mish/conv1x1; ConvBlock shortcut;
    ps/gps/dys upsampler."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    gidx = sorted({
        int(m.group(1)) for key in sd
        if (m := re.match(r"gblocks\.(\d+)\.", key))
    } | {
        int(m.group(1)) for key in sd
        if (m := re.fullmatch(r"gblocks\.(\d+)\.(weight|bias)", key))
    })
    gated = sorted({
        int(m.group(1)) for key in sd
        if (m := re.match(r"gblocks\.(\d+)\.norm\.", key))
    })
    plain = [i for i in gidx if i not in gated]
    # plain[0] = stem; remaining three = 2C conv, C conv, 1x1 conv
    _put_conv(out, "Conv2d_0", sd, f"gblocks.{plain[0]}", used)
    for n, i in enumerate(gated):
        tp, sc = f"gblocks.{i}", f"GatedCNNBlock_{n}"
        _put_ln(out, f"{sc}.LayerNorm_0", sd, f"{tp}.norm", used)
        _put_conv(out, f"{sc}.Conv2d_0", sd, f"{tp}.fc1", used)
        _put_raw_conv(out, f"{sc}.Conv_0", sd, f"{tp}.conv", used)
        _put_conv(out, f"{sc}.Conv2d_1", sd, f"{tp}.fc2", used)
    for n, i in enumerate(plain[1:]):
        _put_conv(out, f"Conv2d_{n + 1}", sd, f"gblocks.{i}", used)
    _put_conv(out, "ConvBlock_0.Conv2d_0", sd, "shortcut.block.0", used)
    _put_conv(out, "ConvBlock_0.Conv2d_1", sd, "shortcut.block.2", used)
    _put_conv(out, "ConvBlock_0.Conv2d_2", sd, "shortcut.conv11", used)
    if "upsampler.offset.weight" in sd:  # dys
        _put_conv(out, "DySample_0.Conv2d_0", sd, "upsampler.offset", used)
        _put_conv(out, "DySample_0.Conv2d_1", sd, "upsampler.scope", used)
        if "upsampler.end_conv.weight" in sd:
            _put_conv(out, "DySample_0.Conv2d_2", sd, "upsampler.end_conv", used)
    elif "upsampler.in_to_k.weight" in sd:  # gps
        _put_conv(out, "GPS_0.Conv2d_0", sd, "upsampler.in_to_k", used)
    elif "upsampler.0.weight" in sd:  # ps (Sequential conv + PixelShuffle)
        _put_conv(out, "Conv2d_4", sd, "upsampler.0", used)
    return out


# ---------------------------------------------------------------- safmn


def convert_safmn(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """SAFMN (reference safmn_arch.py:13-214): to_feat conv, AttBlocks
    (SAFM multi-scale dw pyramid + CCM), to_img conv+ps."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    _put_conv(out, "Conv2d_0", sd, "to_feat", used)
    blocks = sorted({
        int(m.group(1)) for key in sd if (m := re.match(r"feats\.(\d+)\.", key))
    })
    for i in blocks:
        tp, sc = f"feats.{i}", f"AttBlock_{i}"
        _put_ln(out, f"{sc}.LayerNorm_0", sd, f"{tp}.norm1", used)
        _put_ln(out, f"{sc}.LayerNorm_1", sd, f"{tp}.norm2", used)
        for lv in range(4):
            _put_raw_conv(out, f"{sc}.SAFM_0.Conv_{lv}", sd,
                          f"{tp}.safm.mfr.{lv}", used)
        _put_conv(out, f"{sc}.SAFM_0.Conv2d_0", sd, f"{tp}.safm.aggr", used)
        _put_conv(out, f"{sc}.CCM_0.Conv2d_0", sd, f"{tp}.ccm.ccm.0", used)
        _put_conv(out, f"{sc}.CCM_0.Conv2d_1", sd, f"{tp}.ccm.ccm.2", used)
    _put_conv(out, "Conv2d_1", sd, "to_img.0", used)
    return out


def convert_light_safmnpp(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """light SAFMN++ (reference safmn_arch.py:219-291): bias-free convs;
    feats.{i}.conv1 = SimpleSAFM, feats.{i}.conv2 = CCM Sequential."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    _put_conv(out, "Conv2d_0", sd, "to_feat", used)
    blocks = sorted({
        int(m.group(1)) for key in sd if (m := re.match(r"feats\.(\d+)\.", key))
    })
    nc = 1
    for i in blocks:
        tp, sc = f"feats.{i}", f"SimpleSAFM_{i}"
        _put_conv(out, f"{sc}.Conv2d_0", sd, f"{tp}.conv1.proj", used)
        _put_raw_conv(out, f"{sc}.Conv_0", sd, f"{tp}.conv1.dwconv", used)
        _put_conv(out, f"{sc}.Conv2d_1", sd, f"{tp}.conv1.out", used)
        _put_conv(out, f"Conv2d_{nc}", sd, f"{tp}.conv2.conv.0", used)
        _put_conv(out, f"Conv2d_{nc + 1}", sd, f"{tp}.conv2.conv.2", used)
        nc += 2
    _put_conv(out, f"Conv2d_{nc}", sd, "to_img.0", used)
    return out


# ---------------------------------------------------------------- eimn


def convert_eimn(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """EIMN (reference eimn_arch.py:48-319): per-stage block{i}/norm{i};
    BatchNorm running stats are dropped (we normalize by batch stats)."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    _put_conv(out, "Conv2d_0", sd, "head.0", used)
    _put_conv(out, "Conv2d_1", sd, "tail.0", used)

    stages = sorted({
        int(m.group(1)) for key in sd if (m := re.match(r"block(\d+)\.", key))
    })
    blk = 0
    for s in stages:
        depths = sorted({
            int(m.group(1)) for key in sd
            if (m := re.match(rf"block{s}\.(\d+)\.", key))
        })
        for j in depths:
            tp, sc = f"block{s}.{j}", f"EIMNBlock_{blk}"
            blk += 1
            out[f"{sc}.layer_scale_1"] = sd[f"{tp}.layer_scale_1"]
            out[f"{sc}.layer_scale_2"] = sd[f"{tp}.layer_scale_2"]
            for n, norm in enumerate(("norm1", "norm2")):
                _put_bn(out, f"{sc}.BatchStatNorm_{n}", sd, f"{tp}.{norm}", used)
            attn = f"{sc}.MOLRCM_0"
            _put_conv(out, f"{attn}.Conv2d_0", sd, f"{tp}.attn.proj_value.0", used)
            _put_conv(out, f"{attn}.Conv2d_1", sd, f"{tp}.attn.proj_query.0", used)
            _put_raw_conv(out, f"{attn}.Conv_0", sd, f"{tp}.attn.region", used)
            _put_raw_conv(out, f"{attn}.Conv_1", sd, f"{tp}.attn.spatial_1", used)
            _put_raw_conv(out, f"{attn}.Conv_2", sd, f"{tp}.attn.spatial_2", used)
            _put_conv(out, f"{attn}.Conv2d_2", sd, f"{tp}.attn.fusion", used)
            _put_conv(out, f"{attn}.Conv2d_3", sd, f"{tp}.attn.out", used)
            mlp = f"{sc}.SADFFM_0"
            _put_conv(out, f"{mlp}.Conv2d_0", sd, f"{tp}.mlp.linear_in", used)
            _put_raw_conv(out, f"{mlp}.Conv_0", sd, f"{tp}.mlp.SAL", used)
            _put_conv(out, f"{mlp}.Conv2d_1", sd, f"{tp}.mlp.linear_out", used)
            dffm = f"{mlp}.DFFM_0"
            _put_ln(out, f"{dffm}.LayerNorm_0", sd, f"{tp}.mlp.DFFM.norm", used)
            _put_conv(out, f"{dffm}.Conv2d_0", sd, f"{tp}.mlp.DFFM.global_reduce", used)
            _put_conv(out, f"{dffm}.Conv2d_1", sd, f"{tp}.mlp.DFFM.local_reduce", used)
            _put_conv(out, f"{dffm}.Conv2d_2", sd, f"{tp}.mlp.DFFM.channel_expand", used)
            _put_conv(out, f"{dffm}.Conv2d_3", sd, f"{tp}.mlp.DFFM.spatial_expand", used)
        _put_ln(out, f"LayerNorm_{s - 1}", sd, f"norm{s}", used)
    return out


# ---------------------------------------------------------------- ditn


def convert_ditn(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """DITN (reference ditn_arch.py:30-340).  The reference ISA keeps a
    learnable ``temperature`` but its forward discards it (attn recomputed
    by F.scaled_dot_product_attention, ditn_arch.py:124-127) — dropped."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    _put_conv(out, "Conv2d_0", sd, "sft", used)

    def ffn(sc: str, tp: str) -> None:
        _put_conv(out, f"{sc}.Conv2d_0", sd, f"{tp}.project_in", used)
        _put_raw_conv(out, f"{sc}.Conv_0", sd, f"{tp}.dwconv", used)
        _put_conv(out, f"{sc}.Conv2d_1", sd, f"{tp}.project_out", used)

    ufones = sorted({
        int(m.group(1)) for key in sd if (m := re.match(r"UFONE\.(\d+)\.", key))
    })
    n_itl = len({
        int(m.group(1)) for key in sd
        if (m := re.match(r"UFONE\.0\.ITLs\.(\d+)\.", key))
    })
    n_sal = len({
        int(m.group(1)) for key in sd
        if (m := re.match(r"UFONE\.0\.SALs\.(\d+)\.", key))
    })
    for u in ufones:
        for i in range(n_itl):
            tp, sc = f"UFONE.{u}.ITLs.{i}", f"ITL_{u * n_itl + i}"
            _put_conv(out, f"{sc}.Conv2d_0", sd, f"{tp}.conv1", used)
            _put_dense(out, f"{sc}.ISA_0.Dense_0", sd, f"{tp}.attn.qkv", used)
            _put_conv(out, f"{sc}.ISA_0.Conv2d_0", sd, f"{tp}.attn.project_out", used)
            _put_conv(out, f"{sc}.Conv2d_1", sd, f"{tp}.conv2", used)
            ffn(f"{sc}.FeedForward_0", f"{tp}.ffn")
            used.add(f"{tp}.attn.temperature")
        for j in range(n_sal):
            tp, sc = f"UFONE.{u}.SALs.{j}", f"SAL_{u * n_sal + j}"
            _put_conv(out, f"{sc}.Conv2d_0", sd, f"{tp}.conv1", used)
            sda = f"{sc}.SDA_0"
            _put_scale(out, f"{sda}.scale", sd, f"{tp}.SDA.scale", used)
            _put_conv(out, f"{sda}.Conv2d_0", sd, f"{tp}.SDA.proj_first.0", used)
            _put_raw_conv(out, f"{sda}.Conv_0", sd, f"{tp}.SDA.DConvs.0", used)
            _put_raw_conv(out, f"{sda}.Conv_1", sd, f"{tp}.SDA.DConvs.1", used)
            _put_conv(out, f"{sda}.Conv2d_1", sd, f"{tp}.SDA.DConvs.2", used)
            _put_conv(out, f"{sda}.Conv2d_2", sd, f"{tp}.SDA.proj_last.0", used)
            _put_conv(out, f"{sc}.Conv2d_1", sd, f"{tp}.conv2", used)
            ffn(f"{sc}.FeedForward_0", f"{tp}.ffn")
    _put_conv(out, "Conv2d_1", sd, "conv_after_body", used)
    _put_conv(out, "Conv2d_2", sd, "upsample.0", used)
    return out


# ---------------------------------------------------------------- drct


def _put_swinblock(out: dict, sc: str, sd: dict, tp: str, used: set) -> None:
    """One swin_util.SwinBlock <- reference swin-style block keys
    (norm1/norm2, attn.{qkv,proj,relative_position_bias_table}, mlp.fc1/2)."""
    _put_ln(out, f"{sc}.LayerNorm_0", sd, f"{tp}.norm1", used)
    _put_ln(out, f"{sc}.LayerNorm_1", sd, f"{tp}.norm2", used)
    wa = f"{sc}.WindowAttention_0"
    _put_dense(out, f"{wa}.Dense_0", sd, f"{tp}.attn.qkv", used)
    _put_dense(out, f"{wa}.Dense_1", sd, f"{tp}.attn.proj", used)
    out[f"{wa}.relative_position_bias_table"] = sd[
        f"{tp}.attn.relative_position_bias_table"]
    _put_dense(out, f"{sc}.Mlp_0.Dense_0", sd, f"{tp}.mlp.fc1", used)
    _put_dense(out, f"{sc}.Mlp_0.Dense_1", sd, f"{tp}.mlp.fc2", used)


def convert_drct(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """DRCT (reference drct_arch.py:237-956): RDGs of 5 dense swin blocks
    with adjust 1x1 convs; pixel-shuffle head."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    _put_conv(out, "Conv2d_0", sd, "conv_first", used)
    if "patch_embed.norm.weight" in sd:
        _put_ln(out, "LayerNorm_0", sd, "patch_embed.norm", used)
    groups = sorted({
        int(m.group(1)) for key in sd if (m := re.match(r"layers\.(\d+)\.", key))
    })
    for g in groups:
        for k in range(1, 6):
            _put_swinblock(out, f"RDG_{g}.SwinBlock_{k - 1}", sd,
                           f"layers.{g}.swin{k}", used)
            _put_conv(out, f"RDG_{g}.Conv2d_{k - 1}", sd,
                      f"layers.{g}.adjust{k}", used)
    ng = len(groups)
    _put_ln(out, "LayerNorm_1", sd, "norm", used)
    _put_conv(out, "Conv2d_1", sd, "conv_after_body", used)
    if "conv_before_upsample.0.weight" in sd:
        _put_conv(out, "Conv2d_2", sd, "conv_before_upsample.0", used)
        ups = sorted(
            int(m.group(1)) for key in sd
            if (m := re.fullmatch(r"upsample\.(\d+)\.weight", key))
        )
        for n, s in enumerate(ups):
            _put_conv(out, f"Upsample_0.Conv2d_{n}", sd, f"upsample.{s}", used)
        _put_conv(out, "Conv2d_3", sd, "conv_last", used)
    else:
        _put_conv(out, "Conv2d_2", sd, "upsample.0", used)
    return out


# ---------------------------------------------------------------- resnet18 trunk (ea2fpn)


def convert_resnet18_trunk(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """torchvision-layout ResNet18 -> flat params for ea2fpn.ResNet18Trunk.

    This is the ImageNet-weights path for the ea2fpn discriminator trunk
    (reference ea2fpn_arch.py:231-242); BN running stats are dropped (we
    normalize by batch statistics).  Our `BasicBlock(f)(BasicBlock(f)(h))`
    nesting names the OUTER (second-applied) block with the LOWER index, so
    torch layer{L}.1 maps to BasicBlock_{2(L-1)} and layer{L}.0 to
    BasicBlock_{2(L-1)+1}."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    _put_raw_conv(out, "Conv_0", sd, "conv1", used)
    _put_bn(out, "BatchStatNorm_0", sd, "bn1", used)
    for layer in range(1, 5):
        for tb, ob in ((1, 0), (0, 1)):
            tp = f"layer{layer}.{tb}"
            sc = f"BasicBlock_{2 * (layer - 1) + ob}"
            _put_raw_conv(out, f"{sc}.Conv_0", sd, f"{tp}.conv1", used)
            _put_bn(out, f"{sc}.BatchStatNorm_0", sd, f"{tp}.bn1", used)
            _put_raw_conv(out, f"{sc}.Conv_1", sd, f"{tp}.conv2", used)
            _put_bn(out, f"{sc}.BatchStatNorm_1", sd, f"{tp}.bn2", used)
            if f"{tp}.downsample.0.weight" in sd:
                _put_raw_conv(out, f"{sc}.Conv_2", sd, f"{tp}.downsample.0", used)
                _put_bn(out, f"{sc}.BatchStatNorm_2", sd, f"{tp}.downsample.1", used)
    return out


# ---------------------------------------------------------------- craft


def convert_craft(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """CRAFT (reference craft_arch.py:109-964): CRFB groups of SRWAB rect
    attention + HFERB + HFB fusion; model-level rpe buffers dropped."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    _put_conv(out, "Conv2d_0", sd, "conv_first", used)
    groups = sorted({
        int(m.group(1)) for key in sd if (m := re.match(r"layers\.(\d+)\.", key))
    })
    for g in groups:
        gp, gs = f"layers.{g}.residual_group", f"CRFB_{g}"
        n_srwa = len({
            int(m.group(1)) for key in sd
            if (m := re.match(rf"layers\.{g}\.residual_group\.srwa_blocks\.(\d+)\.", key))
        })
        for j in range(n_srwa):
            tp, sc = f"{gp}.srwa_blocks.{j}", f"{gs}.SRWAB_{j}"
            _put_ln(out, f"{sc}.LayerNorm_0", sd, f"{tp}.norm1", used)
            _put_ln(out, f"{sc}.LayerNorm_1", sd, f"{tp}.norm2", used)
            lsa = f"{sc}.L_SA_0"
            _put_dense(out, f"{lsa}.Dense_0", sd, f"{tp}.qkv", used)
            _put_dense(out, f"{lsa}.Dense_1", sd, f"{tp}.proj", used)
            _put_raw_conv(out, f"{lsa}.Conv_0", sd, f"{tp}.get_v", used)
            for br in (0, 1):
                pos = f"{lsa}.SpatialAttentionBranch_{br}.DynamicPosBias_0"
                ptp = f"{tp}.attns.{br}.pos"
                _put_dense(out, f"{pos}.Dense_0", sd, f"{ptp}.pos_proj", used)
                for n in range(1, 4):
                    _put_ln(out, f"{pos}.LayerNorm_{n - 1}", sd,
                            f"{ptp}.pos{n}.0", used)
                    _put_dense(out, f"{pos}.Dense_{n}", sd, f"{ptp}.pos{n}.2", used)
            _put_dense(out, f"{sc}.Mlp_0.Dense_0", sd, f"{tp}.mlp.fc1", used)
            _put_dense(out, f"{sc}.Mlp_0.Dense_1", sd, f"{tp}.mlp.fc2", used)
        for i in range(n_srwa // 2):
            tp, sc = f"{gp}.hfer_blocks.{i}", f"{gs}.HFERB_{i}"
            _put_conv(out, f"{sc}.Conv2d_0", sd, f"{tp}.conv", used)
            _put_conv(out, f"{sc}.Conv2d_1", sd, f"{tp}.fc", used)
            _put_conv(out, f"{sc}.Conv2d_2", sd, f"{tp}.last_fc", used)
            tp, sc = f"{gp}.hf_blocks.{i}", f"{gs}.HFB_{i}"
            _put_ln(out, f"{sc}.LayerNorm_0", sd, f"{tp}.norm1.body", used)
            _put_ln(out, f"{sc}.LayerNorm_1", sd, f"{tp}.norm2.body", used)
            out[f"{sc}.temperature"] = sd[f"{tp}.attn.temperature"]
            _put_conv(out, f"{sc}.Conv2d_0", sd, f"{tp}.attn.q", used)
            _put_raw_conv(out, f"{sc}.Conv_0", sd, f"{tp}.attn.q_dwconv", used)
            _put_conv(out, f"{sc}.Conv2d_1", sd, f"{tp}.attn.kv", used)
            _put_raw_conv(out, f"{sc}.Conv_1", sd, f"{tp}.attn.kv_dwconv", used)
            _put_conv(out, f"{sc}.Conv2d_2", sd, f"{tp}.attn.project_out", used)
            _put_conv(out, f"{sc}.Conv2d_3", sd, f"{tp}.ffn.project_in", used)
            _put_raw_conv(out, f"{sc}.Conv_2", sd, f"{tp}.ffn.dwconv", used)
            _put_conv(out, f"{sc}.Conv2d_4", sd, f"{tp}.ffn.project_out", used)
        _put_conv(out, f"Conv2d_{g + 1}", sd, f"layers.{g}.conv", used)
    ng = len(groups)
    _put_ln(out, "LayerNorm_0", sd, "norm.body", used)
    _put_conv(out, f"Conv2d_{ng + 1}", sd, "conv_after_body", used)
    _put_conv(out, f"Conv2d_{ng + 2}", sd, "upsample.0", used)
    return out


# ---------------------------------------------------------------- hma


def convert_hma(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """HMA (reference hma_arch.py:265-1403): groups of FusedConv + FAB
    blocks, one GAB (grid + dual window attention) and a learnable scale
    per group."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    _put_conv(out, "Conv2d_0", sd, "conv_first", used)
    if "patch_embed.norm.weight" in sd:
        _put_ln(out, "LayerNorm_0", sd, "patch_embed.norm", used)

    def win_attn(our: str, t: str) -> None:
        out[f"{our}.relative_position_bias_table"] = sd[
            f"{t}.relative_position_bias_table"]
        _put_dense(out, f"{our}.Dense_0", sd, f"{t}.proj", used)

    def pos_bias(our: str, t: str) -> None:
        _put_dense(out, f"{our}.Dense_0", sd, f"{t}.pos_proj", used)
        for n in range(1, 4):
            _put_ln(out, f"{our}.LayerNorm_{n - 1}", sd, f"{t}.pos{n}.0", used)
            _put_dense(out, f"{our}.Dense_{n}", sd, f"{t}.pos{n}.2", used)

    groups = sorted({
        int(m.group(1)) for key in sd if (m := re.match(r"layers\.(\d+)\.", key))
    })
    n_fc = n_fab = 0
    for g in groups:
        gp = f"layers.{g}.residual_group"
        idxs = sorted({
            int(m.group(1)) for key in sd
            if (m := re.match(rf"layers\.{g}\.residual_group\.blocks\.(\d+)\.", key))
        })
        for i in idxs:
            tp = f"{gp}.blocks.{i}"
            if f"{tp}.pre_norm.weight" in sd:  # FusedConv
                sc = f"FusedConv_{n_fc}"
                n_fc += 1
                _put_ln(out, f"{sc}.LayerNorm_0", sd, f"{tp}.pre_norm", used)
                _put_conv(out, f"{sc}.Conv2d_0", sd, f"{tp}.fused_conv", used)
                _put_ln(out, f"{sc}.LayerNorm_1", sd, f"{tp}.norm1", used)
                _put_conv(out, f"{sc}.Conv2d_1", sd, f"{tp}.se.fc1", used)
                _put_conv(out, f"{sc}.Conv2d_2", sd, f"{tp}.se.fc2", used)
                _put_conv(out, f"{sc}.Conv2d_3", sd, f"{tp}.conv3_1x1", used)
            else:  # FAB
                sc = f"FAB_{n_fab}"
                n_fab += 1
                _put_ln(out, f"{sc}.LayerNorm_0", sd, f"{tp}.norm1", used)
                _put_dense(out, f"{sc}.Dense_0", sd, f"{tp}.qkv", used)
                win_attn(f"{sc}.WindowAttentionQKV_0", f"{tp}.attn")
                _put_ln(out, f"{sc}.LayerNorm_1", sd, f"{tp}.norm2", used)
                _put_dense(out, f"{sc}.Mlp_0.Dense_0", sd, f"{tp}.mlp.fc1", used)
                _put_dense(out, f"{sc}.Mlp_0.Dense_1", sd, f"{tp}.mlp.fc2", used)
        gab = f"GAB_{g}"
        _put_dense(out, f"{gab}.Dense_0", sd, f"{gp}.gab.qkv", used)
        _put_dense(out, f"{gab}.Dense_1", sd, f"{gp}.gab.grid_proj", used)
        pos_bias(f"{gab}.AffineTransform_0.DynamicPosBias_0",
                 f"{gp}.gab.grid_attn.attn_transform1.pos")
        pos_bias(f"{gab}.AffineTransform_1.DynamicPosBias_0",
                 f"{gp}.gab.grid_attn.attn_transform2.pos")
        win_attn(f"{gab}.WindowAttentionQKV_0", f"{gp}.gab.window_attn")
        win_attn(f"{gab}.WindowAttentionQKV_1", f"{gp}.gab.window_attn_s")
        _put_dense(out, f"{gab}.Dense_2", sd, f"{gp}.gab.fc", used)
        _put_ln(out, f"{gab}.LayerNorm_0", sd, f"{gp}.gab.norm1", used)
        _put_ln(out, f"{gab}.LayerNorm_1", sd, f"{gp}.gab.norm2", used)
        _put_dense(out, f"{gab}.Mlp_0.Dense_0", sd, f"{gp}.gab.mlp.fc1", used)
        _put_dense(out, f"{gab}.Mlp_0.Dense_1", sd, f"{gp}.gab.mlp.fc2", used)
        out[f"group_scale_{g}"] = sd[f"{gp}.scale"]
        _put_conv(out, f"Conv2d_{g + 1}", sd, f"layers.{g}.conv", used)

    ng = len(groups)
    _put_ln(out, "LayerNorm_1", sd, "norm", used)
    _put_conv(out, f"Conv2d_{ng + 1}", sd, "conv_after_body", used)
    _put_conv(out, f"Conv2d_{ng + 2}", sd, "conv_before_upsample.0", used)
    ups = sorted(
        int(m.group(1)) for key in sd
        if (m := re.fullmatch(r"upsample\.(\d+)\.weight", key))
    )
    for n, s in enumerate(ups):
        _put_conv(out, f"Upsample_0.Conv2d_{n}", sd, f"upsample.{s}", used)
    _put_conv(out, f"Conv2d_{ng + 3}", sd, "conv_last", used)
    return out


# ---------------------------------------------------------------- hitsrf


def convert_hitsrf(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """HiT-SR (reference hitsrf_arch.py:16-1157): SCC blocks (DFE qv,
    spatial linear, DynamicPosBias, channel correlation), post-norm,
    ConvFFN k5."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    _put_conv(out, "Conv2d_0", sd, "conv_first", used)
    if "patch_embed.norm.weight" in sd:
        _put_ln(out, "LayerNorm_0", sd, "patch_embed.norm", used)
    groups = sorted({
        int(m.group(1)) for key in sd if (m := re.match(r"layers\.(\d+)\.", key))
    })
    blk = 0
    for g in groups:
        depths = sorted({
            int(m.group(1)) for key in sd
            if (m := re.match(rf"layers\.{g}\.residual_group\.blocks\.(\d+)\.", key))
        })
        for i in depths:
            tp = f"layers.{g}.residual_group.blocks.{i}"
            sc = f"HierarchicalBlock_{blk}"
            blk += 1
            _put_ln(out, f"{sc}.LayerNorm_0", sd, f"{tp}.norm1", used)
            _put_ln(out, f"{sc}.LayerNorm_1", sd, f"{tp}.norm2", used)
            scc = f"{sc}.SCC_0"
            dfe = f"{scc}.DFE_0"
            _put_conv(out, f"{dfe}.Conv2d_0", sd, f"{tp}.correlation.qv.conv.0", used)
            _put_conv(out, f"{dfe}.Conv2d_1", sd, f"{tp}.correlation.qv.conv.2", used)
            _put_conv(out, f"{dfe}.Conv2d_2", sd, f"{tp}.correlation.qv.conv.4", used)
            _put_conv(out, f"{dfe}.Conv2d_3", sd, f"{tp}.correlation.qv.linear", used)
            _put_dense(out, f"{scc}.spatial_linear", sd,
                       f"{tp}.correlation.spatial_linear", used)
            pos = f"{scc}.DynamicPosBias_0"
            ptp = f"{tp}.correlation.pos"
            _put_dense(out, f"{pos}.Dense_0", sd, f"{ptp}.pos_proj", used)
            for n in range(1, 4):
                _put_ln(out, f"{pos}.LayerNorm_{n - 1}", sd, f"{ptp}.pos{n}.0", used)
                _put_dense(out, f"{pos}.Dense_{n}", sd, f"{ptp}.pos{n}.2", used)
            _put_dense(out, f"{scc}.Dense_0", sd, f"{tp}.correlation.proj", used)
            ffn = f"{sc}.ConvFFN_0"
            _put_dense(out, f"{ffn}.Dense_0", sd, f"{tp}.mlp.fc1", used)
            _put_raw_conv(out, f"{ffn}.Conv_0", sd,
                          f"{tp}.mlp.dwconv.depthwise_conv.0", used)
            _put_dense(out, f"{ffn}.Dense_1", sd, f"{tp}.mlp.fc2", used)
        _put_conv(out, f"Conv2d_{g + 1}", sd, f"layers.{g}.conv", used)
    ng = len(groups)
    _put_ln(out, "LayerNorm_1", sd, "norm", used)
    _put_conv(out, f"Conv2d_{ng + 1}", sd, "conv_after_body", used)
    if "conv_before_upsample.0.weight" in sd:
        _put_conv(out, f"Conv2d_{ng + 2}", sd, "conv_before_upsample.0", used)
        ups = sorted(
            int(m.group(1)) for key in sd
            if (m := re.fullmatch(r"upsample\.(\d+)\.weight", key))
        )
        for n, s in enumerate(ups):
            _put_conv(out, f"Upsample_0.Conv2d_{n}", sd, f"upsample.{s}", used)
        _put_conv(out, f"Conv2d_{ng + 3}", sd, "conv_last", used)
    else:
        _put_conv(out, f"Conv2d_{ng + 2}", sd, "upsample.0", used)
    return out


# ---------------------------------------------------------------- grformer


def convert_grformer(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """GRFormer (reference grformer_arch.py:13-623): GRSA grouped-residual
    q/k/v, ESRPB MLP bias (the coords table is a derived buffer), post-norm
    blocks, group conv residual, pixelshuffledirect tail."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    _put_conv(out, "Conv2d_0", sd, "conv_first", used)
    groups = sorted({
        int(m.group(1)) for key in sd if (m := re.match(r"layers\.(\d+)\.", key))
    })
    blk = 0
    for g in groups:
        depths = sorted({
            int(m.group(1)) for key in sd
            if (m := re.match(rf"layers\.{g}\.blocks\.(\d+)\.", key))
        })
        for i in depths:
            tp, sc = f"layers.{g}.blocks.{i}", f"GRSAB_{blk}"
            blk += 1
            _put_ln(out, f"{sc}.LayerNorm_0", sd, f"{tp}.norm1", used)
            _put_ln(out, f"{sc}.LayerNorm_1", sd, f"{tp}.norm2", used)
            attn = f"{sc}.GRSA_0"
            for name in ("q1", "q2", "k1", "k2", "v1", "v2"):
                _put_dense(out, f"{attn}.{name}", sd, f"{tp}.attn.{name}", used)
            out[f"{attn}.logit_scale"] = sd[f"{tp}.attn.logit_scale"]
            _put_dense(out, f"{attn}.Dense_0", sd, f"{tp}.attn.ESRPB_MLP.0", used)
            _put_dense(out, f"{attn}.Dense_1", sd, f"{tp}.attn.ESRPB_MLP.2", used)
            _put_dense(out, f"{attn}.Dense_2", sd, f"{tp}.attn.proj1", used)
            _put_dense(out, f"{attn}.Dense_3", sd, f"{tp}.attn.proj2", used)
            _put_dense(out, f"{sc}.Dense_0", sd, f"{tp}.mlp.fc1", used)
            _put_raw_conv(out, f"{sc}.Conv_0", sd,
                          f"{tp}.mlp.dwconv.depthwise_conv.0", used)
            _put_raw_conv(out, f"{sc}.Conv_1", sd,
                          f"{tp}.mlp.dwconv.depthwise_conv.2", used)
            _put_dense(out, f"{sc}.Dense_1", sd, f"{tp}.mlp.fc2", used)
        _put_conv(out, f"Conv2d_{g + 1}", sd, f"layers.{g}.conv", used)
    ng = len(groups)
    _put_ln(out, "LayerNorm_0", sd, "norm", used)
    _put_conv(out, f"Conv2d_{ng + 1}", sd, "conv_after_body", used)
    _put_conv(out, f"Conv2d_{ng + 2}", sd, "upsample.0", used)
    return out


# ---------------------------------------------------------------- omnisr


def convert_omnisr(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """OmniSR (reference omnisr_arch.py:208-1123): OSAG groups of OSA blocks
    (Sequential `layer` indices: 0 MBConv, 2 block-attn, 4 FFN, 5 channel
    attn, 6 FFN, 8 grid-attn, 10 FFN, 11 grid channel attn, 12 FFN), ESA."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    _put_conv(out, "Conv2d_0", sd, "input", used)
    _put_conv(out, "Conv2d_1", sd, "output", used)
    _put_conv(out, "Conv2d_2", sd, "up.0", used)

    groups = sorted({
        int(m.group(1)) for key in sd
        if (m := re.match(r"residual_layer\.(\d+)\.", key))
    })
    for g in groups:
        gp, gs = f"residual_layer.{g}", f"OSAG_{g}"
        blocks = sorted({
            int(m.group(1)) for key in sd
            if (m := re.match(rf"residual_layer\.{g}\.residual_layer\.(\d+)\.layer\.", key))
        })
        for i in blocks:
            tp = f"{gp}.residual_layer.{i}.layer"
            sc = f"{gs}.OSABlock_{i}"
            mb = f"{sc}.MBConv_0"
            _put_conv(out, f"{mb}.Conv2d_0", sd, f"{tp}.0.fn.0", used)
            _put_raw_conv(out, f"{mb}.Conv_0", sd, f"{tp}.0.fn.2", used)
            se = f"{mb}.SqueezeExcitation_0"
            _put_dense(out, f"{se}.Dense_0", sd, f"{tp}.0.fn.4.gate.1", used)
            _put_dense(out, f"{se}.Dense_1", sd, f"{tp}.0.fn.4.gate.3", used)
            _put_conv(out, f"{mb}.Conv2d_1", sd, f"{tp}.0.fn.5", used)

            def attn(our: str, t: str) -> None:
                _put_dense(out, f"{our}.Dense_0", sd, f"{t}.fn.to_qkv", used)
                _put_dense(out, f"{our}.Dense_1", sd, f"{t}.fn.to_out.0", used)
                out[f"{our}.rel_pos_bias"] = sd[f"{t}.fn.rel_pos_bias.weight"]

            def ffn(our: str, t: str) -> None:
                _put_conv(out, f"{our}.Conv2d_0", sd, f"{t}.fn.project_in", used)
                _put_raw_conv(out, f"{our}.Conv_0", sd, f"{t}.fn.dwconv", used)
                _put_conv(out, f"{our}.Conv2d_1", sd, f"{t}.fn.project_out", used)

            def chan(our: str, t: str) -> None:
                out[f"{our}.temperature"] = sd[f"{t}.fn.temperature"]
                _put_conv(out, f"{our}.Conv2d_0", sd, f"{t}.fn.qkv", used)
                _put_raw_conv(out, f"{our}.Conv_0", sd, f"{t}.fn.qkv_dwconv", used)
                _put_conv(out, f"{our}.Conv2d_1", sd, f"{t}.fn.project_out", used)

            for ln_i, layer_i in enumerate((2, 4, 5, 6, 8, 10, 11, 12)):
                _put_ln(out, f"{sc}.LayerNorm_{ln_i}", sd,
                        f"{tp}.{layer_i}.norm", used)
            attn(f"{sc}.WindowAttentionPE_0", f"{tp}.2")
            ffn(f"{sc}.GatedConvFFN_0", f"{tp}.4")
            chan(f"{sc}.ChannelAttention_0", f"{tp}.5")
            ffn(f"{sc}.GatedConvFFN_1", f"{tp}.6")
            attn(f"{sc}.WindowAttentionPE_1", f"{tp}.8")
            ffn(f"{sc}.GatedConvFFN_2", f"{tp}.10")
            chan(f"{sc}.ChannelAttention_1", f"{tp}.11")
            ffn(f"{sc}.GatedConvFFN_3", f"{tp}.12")
        # the group-tail 1x1 conv sits after the last block in the Sequential
        _put_conv(out, f"{gs}.Conv2d_0", sd,
                  f"{gp}.residual_layer.{max(blocks) + 1}", used)
        esa = f"{gs}.ESA_0"
        _put_conv(out, f"{esa}.Conv2d_0", sd, f"{gp}.esa.conv1", used)
        _put_raw_conv(out, f"{esa}.Conv_0", sd, f"{gp}.esa.conv2", used)
        _put_conv(out, f"{esa}.Conv2d_1", sd, f"{gp}.esa.conv3", used)
        _put_conv(out, f"{esa}.Conv2d_2", sd, f"{gp}.esa.conv_f", used)
        _put_conv(out, f"{esa}.Conv2d_3", sd, f"{gp}.esa.conv4", used)
    return out


# ---------------------------------------------------------------- rgt


def convert_rgt(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """RGT (reference rgt_arch.py:43-960): alternating L_SA (dual rect
    windows + DynamicPosBias + LePE) and RG_SA (recursive shared-conv
    reduction), SGFN, per-block HAI gamma."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    _put_conv(out, "Conv2d_0", sd, "conv_first", used)
    _put_ln(out, "LayerNorm_0", sd, "before_RG.1", used)
    groups = sorted({
        int(m.group(1)) for key in sd if (m := re.match(r"layers\.(\d+)\.", key))
    })
    blk = 0
    for g in groups:
        depths = sorted({
            int(m.group(1)) for key in sd
            if (m := re.match(rf"layers\.{g}\.blocks\.(\d+)\.", key))
        })
        for i in depths:
            tp, sc = f"layers.{g}.blocks.{i}", f"RGTBlock_{blk}"
            blk += 1
            out[f"{sc}.gamma"] = sd[f"{tp}.gamma"]
            _put_ln(out, f"{sc}.LayerNorm_0", sd, f"{tp}.norm1", used)
            _put_ln(out, f"{sc}.LayerNorm_1", sd, f"{tp}.norm2", used)
            if f"{tp}.attn.get_v.weight" in sd:  # L_SA (even blocks)
                attn = f"{sc}.L_SA_0"
                _put_dense(out, f"{attn}.Dense_0", sd, f"{tp}.attn.qkv", used)
                _put_dense(out, f"{attn}.Dense_1", sd, f"{tp}.attn.proj", used)
                _put_raw_conv(out, f"{attn}.Conv_0", sd, f"{tp}.attn.get_v", used)
                for br in (0, 1):
                    pos = f"{attn}.SpatialAttentionBranch_{br}.DynamicPosBias_0"
                    ptp = f"{tp}.attn.attns.{br}.pos"
                    _put_dense(out, f"{pos}.Dense_0", sd, f"{ptp}.pos_proj", used)
                    for n in range(1, 4):
                        _put_ln(out, f"{pos}.LayerNorm_{n - 1}", sd,
                                f"{ptp}.pos{n}.0", used)
                        _put_dense(out, f"{pos}.Dense_{n}", sd,
                                   f"{ptp}.pos{n}.2", used)
            else:  # RG_SA (odd blocks)
                attn = f"{sc}.RG_SA_0"
                _put_raw_conv(out, f"{attn}.Conv_0", sd, f"{tp}.attn.reduction1", used)
                _put_raw_conv(out, f"{attn}.Conv_1", sd, f"{tp}.attn.dwconv", used)
                _put_conv(out, f"{attn}.Conv2d_0", sd, f"{tp}.attn.conv", used)
                _put_ln(out, f"{attn}.LayerNorm_0", sd, f"{tp}.attn.norm_act.0", used)
                _put_dense(out, f"{attn}.Dense_0", sd, f"{tp}.attn.q", used)
                _put_dense(out, f"{attn}.Dense_1", sd, f"{tp}.attn.k", used)
                _put_dense(out, f"{attn}.Dense_2", sd, f"{tp}.attn.v", used)
                _put_raw_conv(out, f"{attn}.Conv_2", sd, f"{tp}.attn.cpe", used)
                _put_dense(out, f"{attn}.Dense_3", sd, f"{tp}.attn.proj", used)
            ffn = f"{sc}.SGFN_0"
            _put_dense(out, f"{ffn}.Dense_0", sd, f"{tp}.mlp.fc1", used)
            _put_ln(out, f"{ffn}.LayerNorm_0", sd, f"{tp}.mlp.sg.norm", used)
            _put_raw_conv(out, f"{ffn}.Conv_0", sd, f"{tp}.mlp.sg.conv", used)
            _put_dense(out, f"{ffn}.Dense_1", sd, f"{tp}.mlp.fc2", used)
        _put_conv(out, f"Conv2d_{g + 1}", sd, f"layers.{g}.conv", used)
    ng = len(groups)
    _put_ln(out, "LayerNorm_1", sd, "norm", used)
    _put_conv(out, f"Conv2d_{ng + 1}", sd, "conv_after_body", used)
    _put_conv(out, f"Conv2d_{ng + 2}", sd, "conv_before_upsample.0", used)
    ups = sorted(
        int(m.group(1)) for key in sd
        if (m := re.fullmatch(r"upsample\.(\d+)\.weight", key))
    )
    for n, s in enumerate(ups):
        _put_conv(out, f"Upsample_0.Conv2d_{n}", sd, f"upsample.{s}", used)
    _put_conv(out, f"Conv2d_{ng + 3}", sd, "conv_last", used)
    return out


# ---------------------------------------------------------------- srformer


def convert_srformer(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """SRFormer (reference srformer_arch.py:124-1263): PSA blocks (separate
    q and 2x-compressed kv projections), ConvFFN with k5 depthwise."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    _put_conv(out, "Conv2d_0", sd, "conv_first", used)
    if "patch_embed.norm.weight" in sd:
        _put_ln(out, "LayerNorm_0", sd, "patch_embed.norm", used)
    groups = sorted({
        int(m.group(1)) for key in sd if (m := re.match(r"layers\.(\d+)\.", key))
    })
    blk = 0
    for g in groups:
        depths = sorted({
            int(m.group(1)) for key in sd
            if (m := re.match(rf"layers\.{g}\.residual_group\.blocks\.(\d+)\.", key))
        })
        for i in depths:
            tp = f"layers.{g}.residual_group.blocks.{i}"
            sc = f"PSABlock_{blk}"
            blk += 1
            _put_ln(out, f"{sc}.LayerNorm_0", sd, f"{tp}.norm1", used)
            _put_ln(out, f"{sc}.LayerNorm_1", sd, f"{tp}.norm2", used)
            psa = f"{sc}.PSA_0"
            _put_dense(out, f"{psa}.Dense_0", sd, f"{tp}.attn.kv", used)
            _put_dense(out, f"{psa}.Dense_1", sd, f"{tp}.attn.q", used)
            _put_dense(out, f"{psa}.Dense_2", sd, f"{tp}.attn.proj", used)
            out[f"{psa}.relative_position_bias_table"] = sd[
                f"{tp}.attn.relative_position_bias_table"]
            ffn = f"{sc}.ConvFFN_0"
            _put_dense(out, f"{ffn}.Dense_0", sd, f"{tp}.mlp.fc1", used)
            _put_raw_conv(out, f"{ffn}.Conv_0", sd,
                          f"{tp}.mlp.dwconv.depthwise_conv.0", used)
            _put_dense(out, f"{ffn}.Dense_1", sd, f"{tp}.mlp.fc2", used)
        _put_conv(out, f"Conv2d_{g + 1}", sd, f"layers.{g}.conv", used)
    ng = len(groups)
    _put_ln(out, "LayerNorm_1", sd, "norm", used)
    _put_conv(out, f"Conv2d_{ng + 1}", sd, "conv_after_body", used)
    if "conv_before_upsample.0.weight" in sd:
        _put_conv(out, f"Conv2d_{ng + 2}", sd, "conv_before_upsample.0", used)
        ups = sorted(
            int(m.group(1)) for key in sd
            if (m := re.fullmatch(r"upsample\.(\d+)\.weight", key))
        )
        for n, s in enumerate(ups):
            _put_conv(out, f"Upsample_0.Conv2d_{n}", sd, f"upsample.{s}", used)
        _put_conv(out, f"Conv2d_{ng + 3}", sd, "conv_last", used)
    else:
        _put_conv(out, f"Conv2d_{ng + 2}", sd, "upsample.0", used)
    return out


# ---------------------------------------------------------------- dat


def _put_bn(out: dict, scope: str, sd: dict, tp: str, used: set) -> None:
    """BatchNorm weight/bias + running stats -> BatchStatNorm."""
    out[f"{scope}.scale"] = sd[f"{tp}.weight"]
    out[f"{scope}.bias"] = sd[f"{tp}.bias"]
    used.update((f"{tp}.weight", f"{tp}.bias"))
    if f"{tp}.running_mean" in sd:
        out[f"batch_stats::{scope}.mean"] = sd[f"{tp}.running_mean"]
        out[f"batch_stats::{scope}.var"] = sd[f"{tp}.running_var"]
        used.update((f"{tp}.running_mean", f"{tp}.running_var",
                     f"{tp}.num_batches_tracked"))


def convert_dat(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """DAT (reference dat_arch.py:42-1122): alternating spatial/channel
    axial attention blocks with AIM conv interaction, SGFN, 1conv residual
    groups.  Derived rpe tables / relative_position_index dropped."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    _put_conv(out, "Conv2d_0", sd, "conv_first", used)
    _put_ln(out, "LayerNorm_0", sd, "before_RG.1", used)

    groups = sorted({
        int(m.group(1)) for key in sd if (m := re.match(r"layers\.(\d+)\.", key))
    })
    blk = 0
    for g in groups:
        depths = sorted({
            int(m.group(1)) for key in sd
            if (m := re.match(rf"layers\.{g}\.blocks\.(\d+)\.", key))
        })
        for i in depths:
            tp, sc = f"layers.{g}.blocks.{i}", f"DATB_{blk}"
            blk += 1
            _put_ln(out, f"{sc}.LayerNorm_0", sd, f"{tp}.norm1", used)
            _put_ln(out, f"{sc}.LayerNorm_1", sd, f"{tp}.norm2", used)
            spatial = f"{tp}.attn.attns.0.pos.pos_proj.weight" in sd
            attn = (f"{sc}.AxialSpatialAttention_0" if spatial
                    else f"{sc}.AxialChannelAttention_0")
            _put_dense(out, f"{attn}.Dense_0", sd, f"{tp}.attn.qkv", used)
            _put_dense(out, f"{attn}.Dense_1", sd, f"{tp}.attn.proj", used)
            if spatial:
                for br in (0, 1):
                    pos = f"{attn}.SpatialAttentionBranch_{br}.DynamicPosBias_0"
                    ptp = f"{tp}.attn.attns.{br}.pos"
                    _put_dense(out, f"{pos}.Dense_0", sd, f"{ptp}.pos_proj", used)
                    for n in range(1, 4):
                        _put_ln(out, f"{pos}.LayerNorm_{n - 1}", sd,
                                f"{ptp}.pos{n}.0", used)
                        _put_dense(out, f"{pos}.Dense_{n}", sd,
                                   f"{ptp}.pos{n}.2", used)
            else:
                out[f"{attn}.temperature"] = sd[f"{tp}.attn.temperature"]
            _put_raw_conv(out, f"{attn}.Conv_0", sd, f"{tp}.attn.dwconv.0", used)
            _put_bn(out, f"{attn}.BatchStatNorm_0", sd, f"{tp}.attn.dwconv.1", used)
            _put_conv(out, f"{attn}.Conv2d_0", sd,
                      f"{tp}.attn.channel_interaction.1", used)
            _put_bn(out, f"{attn}.BatchStatNorm_1", sd,
                    f"{tp}.attn.channel_interaction.2", used)
            _put_conv(out, f"{attn}.Conv2d_1", sd,
                      f"{tp}.attn.channel_interaction.4", used)
            _put_conv(out, f"{attn}.Conv2d_2", sd,
                      f"{tp}.attn.spatial_interaction.0", used)
            _put_bn(out, f"{attn}.BatchStatNorm_2", sd,
                    f"{tp}.attn.spatial_interaction.1", used)
            _put_conv(out, f"{attn}.Conv2d_3", sd,
                      f"{tp}.attn.spatial_interaction.3", used)
            ffn = f"{sc}.SGFN_0"
            _put_dense(out, f"{ffn}.Dense_0", sd, f"{tp}.ffn.fc1", used)
            _put_ln(out, f"{ffn}.LayerNorm_0", sd, f"{tp}.ffn.sg.norm", used)
            _put_raw_conv(out, f"{ffn}.Conv_0", sd, f"{tp}.ffn.sg.conv", used)
            _put_dense(out, f"{ffn}.Dense_1", sd, f"{tp}.ffn.fc2", used)
        _put_conv(out, f"Conv2d_{g + 1}", sd, f"layers.{g}.conv", used)

    ng = len(groups)
    _put_ln(out, "LayerNorm_1", sd, "norm", used)
    _put_conv(out, f"Conv2d_{ng + 1}", sd, "conv_after_body", used)
    if "conv_before_upsample.0.weight" in sd:  # pixelshuffle
        _put_conv(out, f"Conv2d_{ng + 2}", sd, "conv_before_upsample.0", used)
        ups = sorted(
            int(m.group(1)) for key in sd
            if (m := re.fullmatch(r"upsample\.(\d+)\.weight", key))
        )
        for n, s in enumerate(ups):
            _put_conv(out, f"Upsample_0.Conv2d_{n}", sd, f"upsample.{s}", used)
        _put_conv(out, f"Conv2d_{ng + 3}", sd, "conv_last", used)
    else:  # pixelshuffledirect
        _put_conv(out, f"Conv2d_{ng + 2}", sd, "upsample.0", used)
    return out


# ---------------------------------------------------------------- dctlsa


def convert_dctlsa(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """DCTLSA (reference dctlsa_arch.py:12-593): B1..B6 LSAB groups (2 SwinT
    x 2 blocks), dense-fusion 1x1 convs c1..c5 + c, LR_conv, pixel-shuffle
    upsampler.  BatchNorm running stats dropped (batch-statistics mode)."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    _put_conv(out, "Conv2d_0", sd, "fea_conv", used)
    n_groups = len({k.split(".")[0] for k in sd if re.match(r"B\d+\.", k)})
    for g in range(n_groups):
        for i in range(2):  # SwinT per LSAB
            tp = f"B{g + 1}.body.{i}.transformer_body.0"
            sc = f"LSAB_{g}.SwinT_{i}"
            _put_ln(out, f"{sc}.patch_norm", sd, f"{tp}.patch_embed.norm", used)
            for j in range(2):  # blocks per SwinT
                btp = f"{tp}.blocks.{j}"
                bsc = f"{sc}.SwinTBlock_{j}"
                attn = f"{bsc}.LinearWindowAttention_0"
                _put_dense(out, f"{attn}.Dense_0", sd, f"{btp}.attn.qkv", used)
                _put_dense(out, f"{attn}.Dense_1", sd, f"{btp}.attn.proj", used)
                loc = f"{attn}.LocalModule_0"
                for n in range(2):
                    _put_bn(out, f"{loc}.BatchStatNorm_{n}", sd,
                            f"{btp}.attn.local.pointwise_prenorm_{n}", used)
                    _put_conv(out, f"{loc}.Conv2d_{n}", sd,
                              f"{btp}.attn.local.pointwise_conv_{n}", used)
                _put_raw_conv(out, f"{loc}.Conv_0", sd,
                              f"{btp}.attn.local.depthwise_conv", used)
                _put_dense(out, f"{bsc}.Dense_0", sd, f"{btp}.mlp.fc1", used)
                _put_dense(out, f"{bsc}.Dense_1", sd, f"{btp}.mlp.fc2", used)
    for n in range(1, n_groups):  # c1..c5
        _put_conv(out, f"Conv2d_{n}", sd, f"c{n}.0", used)
    _put_conv(out, f"Conv2d_{n_groups}", sd, "c.0", used)
    _put_conv(out, f"Conv2d_{n_groups + 1}", sd, "LR_conv", used)
    _put_conv(out, f"Conv2d_{n_groups + 2}", sd, "upsampler.0", used)
    return out


# ---------------------------------------------------------------- cugan


def _put_deconv(out: dict, key_prefix: str, sd: dict, tp: str, used: set) -> None:
    """torch ConvTranspose2d (in,out,kh,kw) -> flax ConvTranspose kernel
    (kh,kw,in,out) with spatial flip (verified-exact mapping)."""
    w = sd[f"{tp}.weight"]
    out[f"{key_prefix}.kernel"] = np.ascontiguousarray(
        np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]
    )
    used.add(f"{tp}.weight")
    if f"{tp}.bias" in sd:
        out[f"{key_prefix}.bias"] = sd[f"{tp}.bias"]
        used.add(f"{tp}.bias")


def convert_cugan(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Real-CUGAN (reference cugan_arch.py:12-332): unet1 (UNet1/UNet1x3) +
    unet2 + optional conv_final (scale 4); `pro` buffer is a marker only."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()

    def unet_conv(sc: str, tp: str) -> None:
        _put_raw_conv(out, f"{sc}.Conv_0", sd, f"{tp}.conv.0", used)
        _put_raw_conv(out, f"{sc}.Conv_1", sd, f"{tp}.conv.2", used)
        if f"{tp}.seblock.conv1.weight" in sd:
            _put_raw_conv(out, f"{sc}.SEBlock_0.Conv_0", sd, f"{tp}.seblock.conv1", used)
            _put_raw_conv(out, f"{sc}.SEBlock_0.Conv_1", sd, f"{tp}.seblock.conv2", used)

    u1 = "UNet1_0"
    unet_conv(f"{u1}.UNetConv_0", "unet1.conv1")
    _put_raw_conv(out, f"{u1}.Conv_0", sd, "unet1.conv1_down", used)
    unet_conv(f"{u1}.UNetConv_1", "unet1.conv2")
    _put_deconv(out, f"{u1}.ConvTranspose_0", sd, "unet1.conv2_up", used)
    _put_raw_conv(out, f"{u1}.Conv_1", sd, "unet1.conv3", used)
    if sd["unet1.conv_bottom.weight"].shape[-1] >= 4:  # deconv k4 (x2/x4) / k5 (x3)
        _put_deconv(out, f"{u1}.ConvTranspose_1", sd, "unet1.conv_bottom", used)
    else:
        _put_raw_conv(out, f"{u1}.Conv_2", sd, "unet1.conv_bottom", used)

    u2 = "UNet2_0"
    unet_conv(f"{u2}.UNetConv_0", "unet2.conv1")
    _put_raw_conv(out, f"{u2}.Conv_0", sd, "unet2.conv1_down", used)
    unet_conv(f"{u2}.UNetConv_1", "unet2.conv2")
    _put_raw_conv(out, f"{u2}.Conv_1", sd, "unet2.conv2_down", used)
    unet_conv(f"{u2}.UNetConv_2", "unet2.conv3")
    _put_deconv(out, f"{u2}.ConvTranspose_0", sd, "unet2.conv3_up", used)
    unet_conv(f"{u2}.UNetConv_3", "unet2.conv4")
    _put_deconv(out, f"{u2}.ConvTranspose_1", sd, "unet2.conv4_up", used)
    _put_raw_conv(out, f"{u2}.Conv_2", sd, "unet2.conv5", used)
    _put_raw_conv(out, f"{u2}.Conv_3", sd, "unet2.conv_bottom", used)

    if "conv_final.weight" in sd:  # scale 4 head
        _put_raw_conv(out, "Conv_0", sd, "conv_final", used)
    return out


# ---------------------------------------------------------------- msdan


def convert_msdan(sd: dict[str, np.ndarray], scale: int = 4) -> dict[str, np.ndarray]:
    """MSDAN (reference msdan_arch.py:32-464).  Our modules carry the
    reference attribute names, so this is a key-syntax rewrite; the
    reference constructs BOTH x2 and x3 upsampler stages and uses only the
    one matching `scale` — unused stages are dropped."""
    skip = {"BSConv_3", "BSConv1_3"} if scale in (2, 4) else {"BSConv_2", "BSConv1_2"}
    out: dict[str, np.ndarray] = {}
    for key, val in sd.items():
        parts = key.split(".")
        if parts[0] == "layers":  # layers.{i}.EBFB... -> DFEB_{i}.EBFB...
            parts[0:2] = [f"DFEB_{parts[1]}"]
        elif parts[0] == "upsampler":
            if parts[1] in skip:
                continue
            parts = parts[1:]
        if parts[-1] == "weight" and val.ndim == 4:
            val = _k(val)
            parts[-1] = "kernel"
            if parts[-2] != "dw":  # dw is a bare nn.Conv; others wrap Conv_0
                parts.insert(-1, "Conv_0")
        elif parts[-1] == "bias" and parts[-2] != "dw":
            parts.insert(-1, "Conv_0")
        out[".".join(parts)] = val
    return out


EXT_CONVERTERS: dict[str, Callable[[dict], dict]] = {
    "man": convert_man,
    "mosr": convert_mosr,
    "safmn": convert_safmn,
    "light_safmnpp": convert_light_safmnpp,
    "eimn": convert_eimn,
    "ditn": convert_ditn,
    "msdan": convert_msdan,
    "cugan": convert_cugan,
    "dctlsa": convert_dctlsa,
    "dat": convert_dat,
    "drct": convert_drct,
    "srformer": convert_srformer,
    "rgt": convert_rgt,
    "omnisr": convert_omnisr,
    "grformer": convert_grformer,
    "hit_srf": convert_hitsrf,
    "hma": convert_hma,
    "craft": convert_craft,
}


# ---------------------------------------------------------------- exporters


def _get_swinblock(flat: dict, sc: str, out: dict, tp: str) -> None:
    """Inverse of _put_swinblock (swin_util.SwinBlock -> reference keys)."""
    from neosr_tpu.utils.torch_interop import _get_dense, _get_ln

    _get_ln(flat, f"{sc}.LayerNorm_0", out, f"{tp}.norm1")
    _get_ln(flat, f"{sc}.LayerNorm_1", out, f"{tp}.norm2")
    wa = f"{sc}.WindowAttention_0"
    _get_dense(flat, f"{wa}.Dense_0", out, f"{tp}.attn.qkv")
    _get_dense(flat, f"{wa}.Dense_1", out, f"{tp}.attn.proj")
    out[f"{tp}.attn.relative_position_bias_table"] = flat[
        f"{wa}.relative_position_bias_table"]
    _get_dense(flat, f"{sc}.Mlp_0.Dense_0", out, f"{tp}.mlp.fc1")
    _get_dense(flat, f"{sc}.Mlp_0.Dense_1", out, f"{tp}.mlp.fc2")


def export_drct(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_drct: our RDG params -> reference drct layout
    (layers.{g}.swin{k}/adjust{k}; derived rpi/mask buffers not emitted)."""
    from neosr_tpu.utils.torch_interop import _get_conv, _get_ln

    out: dict[str, np.ndarray] = {}
    _get_conv(flat, "Conv2d_0", out, "conv_first")
    if "LayerNorm_0.scale" in flat:
        _get_ln(flat, "LayerNorm_0", out, "patch_embed.norm")
    _get_ln(flat, "LayerNorm_1", out, "norm")
    groups = sorted({
        int(m.group(1)) for key in flat
        if (m := re.match(r"RDG_(\d+)\.", key))
    })
    for g in groups:
        for k in range(1, 6):
            _get_swinblock(flat, f"RDG_{g}.SwinBlock_{k - 1}", out,
                           f"layers.{g}.swin{k}")
            _get_conv(flat, f"RDG_{g}.Conv2d_{k - 1}", out,
                      f"layers.{g}.adjust{k}")
    _get_conv(flat, "Conv2d_1", out, "conv_after_body")
    if "Upsample_0.Conv2d_0.Conv_0.kernel" in flat:
        _get_conv(flat, "Conv2d_2", out, "conv_before_upsample.0")
        k = 0
        while f"Upsample_0.Conv2d_{k}.Conv_0.kernel" in flat:
            _get_conv(flat, f"Upsample_0.Conv2d_{k}", out, f"upsample.{2 * k}")
            k += 1
        _get_conv(flat, "Conv2d_3", out, "conv_last")
    else:
        _get_conv(flat, "Conv2d_2", out, "upsample.0")
    return out


EXT_EXPORTERS: dict[str, Callable[[dict], dict]] = {
    "drct": export_drct,
}


def export_srformer(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_srformer.  Our PSABlock scoping is flat across
    groups, so the per-group block count is inferred as uniform (true for
    both reference presets srformer_light/medium, srformer_arch.py:1232-
    1263); non-uniform depths are not reconstructable from params alone."""
    from neosr_tpu.utils.torch_interop import (
        _get_conv,
        _get_dense,
        _get_ln,
        _ik,
    )

    out: dict[str, np.ndarray] = {}
    n_blocks = len({
        int(m.group(1)) for key in flat
        if (m := re.match(r"PSABlock_(\d+)\.", key))
    })
    tops = {
        int(m.group(1)) for key in flat
        if (m := re.fullmatch(r"Conv2d_(\d+)\.Conv_0\.kernel", key))
    }
    ps_head = any(key.startswith("Upsample_0.") for key in flat)
    ng = len(tops) - (4 if ps_head else 3)
    per = n_blocks // ng
    if per * ng != n_blocks:
        msg = "srformer export requires uniform depths across groups"
        raise ValueError(msg)

    _get_conv(flat, "Conv2d_0", out, "conv_first")
    if "LayerNorm_0.scale" in flat:
        _get_ln(flat, "LayerNorm_0", out, "patch_embed.norm")
    _get_ln(flat, "LayerNorm_1", out, "norm")
    for g in range(ng):
        for i in range(per):
            sc = f"PSABlock_{g * per + i}"
            tp = f"layers.{g}.residual_group.blocks.{i}"
            _get_ln(flat, f"{sc}.LayerNorm_0", out, f"{tp}.norm1")
            _get_ln(flat, f"{sc}.LayerNorm_1", out, f"{tp}.norm2")
            psa = f"{sc}.PSA_0"
            _get_dense(flat, f"{psa}.Dense_0", out, f"{tp}.attn.kv")
            _get_dense(flat, f"{psa}.Dense_1", out, f"{tp}.attn.q")
            _get_dense(flat, f"{psa}.Dense_2", out, f"{tp}.attn.proj")
            out[f"{tp}.attn.relative_position_bias_table"] = flat[
                f"{psa}.relative_position_bias_table"]
            ffn = f"{sc}.ConvFFN_0"
            _get_dense(flat, f"{ffn}.Dense_0", out, f"{tp}.mlp.fc1")
            out[f"{tp}.mlp.dwconv.depthwise_conv.0.weight"] = _ik(
                flat[f"{ffn}.Conv_0.kernel"])
            out[f"{tp}.mlp.dwconv.depthwise_conv.0.bias"] = flat[
                f"{ffn}.Conv_0.bias"]
            _get_dense(flat, f"{ffn}.Dense_1", out, f"{tp}.mlp.fc2")
        _get_conv(flat, f"Conv2d_{g + 1}", out, f"layers.{g}.conv")
    _get_conv(flat, f"Conv2d_{ng + 1}", out, "conv_after_body")
    if ps_head:
        _get_conv(flat, f"Conv2d_{ng + 2}", out, "conv_before_upsample.0")
        k = 0
        while f"Upsample_0.Conv2d_{k}.Conv_0.kernel" in flat:
            _get_conv(flat, f"Upsample_0.Conv2d_{k}", out, f"upsample.{2 * k}")
            k += 1
        _get_conv(flat, f"Conv2d_{ng + 3}", out, "conv_last")
    else:
        _get_conv(flat, f"Conv2d_{ng + 2}", out, "upsample.0")
    return out


EXT_EXPORTERS["srformer"] = export_srformer

# dat/eimn/dctlsa exporters live at the end of this file: their BatchNorm
# running statistics are tracked in the "batch_stats" collection and ride
# into the torch layout via the batch_stats:: side-channel (_get_bn), so
# eval-mode behavior transfers exactly.


def _get_raw_conv(flat: dict, key_prefix: str, out: dict, tp: str) -> None:
    """Inverse of _put_raw_conv (bare nn.Conv scope)."""
    from neosr_tpu.utils.torch_interop import _ik

    out[f"{tp}.weight"] = _ik(flat[f"{key_prefix}.kernel"])
    if f"{key_prefix}.bias" in flat:
        out[f"{tp}.bias"] = flat[f"{key_prefix}.bias"]


def _get_bn(flat: dict, scope: str, out: dict, tp: str) -> None:
    """Inverse of _put_bn: BatchStatNorm + running stats -> torch BN keys.
    Running statistics come from the `batch_stats::` side-channel when the
    caller passed the collection (to_torch_state_dict(batch_stats=...));
    otherwise the torch init values (0 mean / 1 var) are emitted so the
    checkpoint still loads strict."""
    out[f"{tp}.weight"] = flat[f"{scope}.scale"]
    out[f"{tp}.bias"] = flat[f"{scope}.bias"]
    c = flat[f"{scope}.scale"].shape[0]
    mkey = f"batch_stats::{scope}.mean"
    out[f"{tp}.running_mean"] = (
        flat[mkey] if mkey in flat else np.zeros((c,), np.float32)
    )
    out[f"{tp}.running_var"] = (
        flat[f"batch_stats::{scope}.var"] if mkey in flat
        else np.ones((c,), np.float32)
    )
    out[f"{tp}.num_batches_tracked"] = np.zeros((), np.int64)


def _get_deconv(flat: dict, key_prefix: str, out: dict, tp: str) -> None:
    """Inverse of _put_deconv: (kh,kw,in,out) flipped -> torch (in,out,kh,kw)."""
    w = flat[f"{key_prefix}.kernel"]
    out[f"{tp}.weight"] = np.ascontiguousarray(
        np.transpose(w[::-1, ::-1], (2, 3, 0, 1)))
    if f"{key_prefix}.bias" in flat:
        out[f"{tp}.bias"] = flat[f"{key_prefix}.bias"]


def _get_scale(flat: dict, key: str, out: dict, torch_key: str) -> None:
    """flat (C,) channel-scale -> torch (1,C,1,1)."""
    out[torch_key] = np.asarray(flat[key]).reshape(1, -1, 1, 1)


def export_man(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_man (reference man_arch.py layout)."""
    from neosr_tpu.utils.torch_interop import _get_conv, _get_ln

    out: dict[str, np.ndarray] = {}
    _get_conv(flat, "Conv2d_0", out, "head")
    groups = sorted({
        int(m.group(1)) for key in flat
        if (m := re.match(r"ResGroup_(\d+)\.", key))
    })
    multi = "Conv2d_2.Conv_0.kernel" in flat
    for g in groups:
        gp, gs = f"body.{g}", f"ResGroup_{g}"
        blocks = sorted({
            int(m.group(1)) for key in flat
            if (m := re.match(rf"ResGroup_{g}\.GroupGLKA_(\d+)\.", key))
        })
        for b in blocks:
            tp, sc = f"{gp}.body.{b}.LKA", f"{gs}.GroupGLKA_{b}"
            _get_ln(flat, f"{sc}.LayerNorm_0", out, f"{tp}.norm")
            _get_conv(flat, f"{sc}.Conv2d_0", out, f"{tp}.proj_first.0")
            for n, (lka, x_dw) in enumerate((("LKA3", "X3"), ("LKA5", "X5"),
                                             ("LKA7", "X7"))):
                _get_raw_conv(flat, f"{sc}.Conv_{3 * n}", out, f"{tp}.{lka}.0")
                _get_raw_conv(flat, f"{sc}.Conv_{3 * n + 1}", out, f"{tp}.{lka}.1")
                _get_conv(flat, f"{sc}.Conv2d_{n + 1}", out, f"{tp}.{lka}.2")
                _get_raw_conv(flat, f"{sc}.Conv_{3 * n + 2}", out, f"{tp}.{x_dw}")
            _get_conv(flat, f"{sc}.Conv2d_4", out, f"{tp}.proj_last.0")
            _get_scale(flat, f"{sc}.ChannelScale_0.scale", out, f"{tp}.scale")
            tp, sc = f"{gp}.body.{b}.LFE", f"{gs}.SGAB_{b}"
            _get_ln(flat, f"{sc}.LayerNorm_0", out, f"{tp}.norm")
            _get_conv(flat, f"{sc}.Conv2d_0", out, f"{tp}.Conv1")
            _get_raw_conv(flat, f"{sc}.Conv_0", out, f"{tp}.DWConv1")
            _get_conv(flat, f"{sc}.Conv2d_1", out, f"{tp}.Conv2")
            _get_scale(flat, f"{sc}.ChannelScale_0.scale", out, f"{tp}.scale")
        tp, sc = f"{gp}.body_t", f"{gs}.LKAT_0"
        _get_conv(flat, f"{sc}.Conv2d_0", out, f"{tp}.conv0.0")
        _get_raw_conv(flat, f"{sc}.Conv_0", out, f"{tp}.att.0")
        _get_raw_conv(flat, f"{sc}.Conv_1", out, f"{tp}.att.1")
        _get_conv(flat, f"{sc}.Conv2d_1", out, f"{tp}.att.2")
        _get_conv(flat, f"{sc}.Conv2d_2", out, f"{tp}.conv1")
    if multi:
        _get_conv(flat, "Conv2d_1", out, "body_t")
        _get_conv(flat, "Conv2d_2", out, "tail.0")
    else:
        _get_conv(flat, "Conv2d_1", out, "tail.0")
    return out


def export_safmn(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_safmn."""
    from neosr_tpu.utils.torch_interop import _get_conv, _get_ln

    out: dict[str, np.ndarray] = {}
    _get_conv(flat, "Conv2d_0", out, "to_feat")
    blocks = sorted({
        int(m.group(1)) for key in flat
        if (m := re.match(r"AttBlock_(\d+)\.", key))
    })
    for i in blocks:
        tp, sc = f"feats.{i}", f"AttBlock_{i}"
        _get_ln(flat, f"{sc}.LayerNorm_0", out, f"{tp}.norm1")
        _get_ln(flat, f"{sc}.LayerNorm_1", out, f"{tp}.norm2")
        for lv in range(4):
            _get_raw_conv(flat, f"{sc}.SAFM_0.Conv_{lv}", out,
                          f"{tp}.safm.mfr.{lv}")
        _get_conv(flat, f"{sc}.SAFM_0.Conv2d_0", out, f"{tp}.safm.aggr")
        _get_conv(flat, f"{sc}.CCM_0.Conv2d_0", out, f"{tp}.ccm.ccm.0")
        _get_conv(flat, f"{sc}.CCM_0.Conv2d_1", out, f"{tp}.ccm.ccm.2")
    _get_conv(flat, "Conv2d_1", out, "to_img.0")
    return out


def export_light_safmnpp(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_light_safmnpp."""
    from neosr_tpu.utils.torch_interop import _get_conv

    out: dict[str, np.ndarray] = {}
    _get_conv(flat, "Conv2d_0", out, "to_feat")
    blocks = sorted({
        int(m.group(1)) for key in flat
        if (m := re.match(r"SimpleSAFM_(\d+)\.", key))
    })
    nc = 1
    for i in blocks:
        tp, sc = f"feats.{i}", f"SimpleSAFM_{i}"
        _get_conv(flat, f"{sc}.Conv2d_0", out, f"{tp}.conv1.proj")
        _get_raw_conv(flat, f"{sc}.Conv_0", out, f"{tp}.conv1.dwconv")
        _get_conv(flat, f"{sc}.Conv2d_1", out, f"{tp}.conv1.out")
        _get_conv(flat, f"Conv2d_{nc}", out, f"{tp}.conv2.conv.0")
        _get_conv(flat, f"Conv2d_{nc + 1}", out, f"{tp}.conv2.conv.2")
        nc += 2
    _get_conv(flat, f"Conv2d_{nc}", out, "to_img.0")
    return out


def export_mosr(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_mosr (gblocks Sequential index reconstruction:
    stem at 0, gated blocks 1..n, tail convs at n+1/n+3/n+5 — the reference
    interleaves activations as separate Sequential entries)."""
    from neosr_tpu.utils.torch_interop import _get_conv, _get_ln

    out: dict[str, np.ndarray] = {}
    n_gated = len({
        int(m.group(1)) for key in flat
        if (m := re.match(r"GatedCNNBlock_(\d+)\.", key))
    })
    _get_conv(flat, "Conv2d_0", out, "gblocks.0")
    for n in range(n_gated):
        tp, sc = f"gblocks.{n + 1}", f"GatedCNNBlock_{n}"
        _get_ln(flat, f"{sc}.LayerNorm_0", out, f"{tp}.norm")
        _get_conv(flat, f"{sc}.Conv2d_0", out, f"{tp}.fc1")
        _get_raw_conv(flat, f"{sc}.Conv_0", out, f"{tp}.conv")
        _get_conv(flat, f"{sc}.Conv2d_1", out, f"{tp}.fc2")
    # tail: conv(2C) @ n+1, Mish, conv(C) @ n+3, Mish, conv1x1 @ n+5
    base = n_gated + 1
    for n, off in enumerate((0, 2, 4)):
        _get_conv(flat, f"Conv2d_{n + 1}", out, f"gblocks.{base + off}")
    _get_conv(flat, "ConvBlock_0.Conv2d_0", out, "shortcut.block.0")
    _get_conv(flat, "ConvBlock_0.Conv2d_1", out, "shortcut.block.2")
    _get_conv(flat, "ConvBlock_0.Conv2d_2", out, "shortcut.conv11")
    if "DySample_0.Conv2d_0.Conv_0.kernel" in flat:
        from neosr_tpu.utils.torch_interop import (
            _get_dysample,
            _infer_dysample_scale,
        )

        _get_dysample(flat, "DySample_0", out, "upsampler",
                      scale=_infer_dysample_scale(flat, "DySample_0"))
    elif "GPS_0.Conv2d_0.Conv_0.kernel" in flat:
        _get_conv(flat, "GPS_0.Conv2d_0", out, "upsampler.in_to_k")
    else:
        _get_conv(flat, "Conv2d_4", out, "upsampler.0")
    return out


def export_cugan(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_cugan."""
    out: dict[str, np.ndarray] = {}

    def unet_conv(sc: str, tp: str) -> None:
        _get_raw_conv(flat, f"{sc}.Conv_0", out, f"{tp}.conv.0")
        _get_raw_conv(flat, f"{sc}.Conv_1", out, f"{tp}.conv.2")
        if f"{sc}.SEBlock_0.Conv_0.kernel" in flat:
            _get_raw_conv(flat, f"{sc}.SEBlock_0.Conv_0", out, f"{tp}.seblock.conv1")
            _get_raw_conv(flat, f"{sc}.SEBlock_0.Conv_1", out, f"{tp}.seblock.conv2")

    u1 = "UNet1_0"
    unet_conv(f"{u1}.UNetConv_0", "unet1.conv1")
    _get_raw_conv(flat, f"{u1}.Conv_0", out, "unet1.conv1_down")
    unet_conv(f"{u1}.UNetConv_1", "unet1.conv2")
    _get_deconv(flat, f"{u1}.ConvTranspose_0", out, "unet1.conv2_up")
    _get_raw_conv(flat, f"{u1}.Conv_1", out, "unet1.conv3")
    if f"{u1}.ConvTranspose_1.kernel" in flat:
        _get_deconv(flat, f"{u1}.ConvTranspose_1", out, "unet1.conv_bottom")
    else:
        _get_raw_conv(flat, f"{u1}.Conv_2", out, "unet1.conv_bottom")

    u2 = "UNet2_0"
    unet_conv(f"{u2}.UNetConv_0", "unet2.conv1")
    _get_raw_conv(flat, f"{u2}.Conv_0", out, "unet2.conv1_down")
    unet_conv(f"{u2}.UNetConv_1", "unet2.conv2")
    _get_raw_conv(flat, f"{u2}.Conv_1", out, "unet2.conv2_down")
    unet_conv(f"{u2}.UNetConv_2", "unet2.conv3")
    _get_deconv(flat, f"{u2}.ConvTranspose_0", out, "unet2.conv3_up")
    unet_conv(f"{u2}.UNetConv_3", "unet2.conv4")
    _get_deconv(flat, f"{u2}.ConvTranspose_1", out, "unet2.conv4_up")
    _get_raw_conv(flat, f"{u2}.Conv_2", out, "unet2.conv5")
    _get_raw_conv(flat, f"{u2}.Conv_3", out, "unet2.conv_bottom")
    if "Conv_0.kernel" in flat:
        _get_raw_conv(flat, "Conv_0", out, "conv_final")
    return out


EXT_EXPORTERS.update({
    "man": export_man,
    "safmn": export_safmn,
    "light_safmnpp": export_light_safmnpp,
    "mosr": export_mosr,
    "cugan": export_cugan,
})


def export_omnisr(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_omnisr (reference omnisr_arch.py layout)."""
    from neosr_tpu.utils.torch_interop import _get_conv, _get_dense, _get_ln

    out: dict[str, np.ndarray] = {}
    _get_conv(flat, "Conv2d_0", out, "input")
    _get_conv(flat, "Conv2d_1", out, "output")
    _get_conv(flat, "Conv2d_2", out, "up.0")
    groups = sorted({
        int(m.group(1)) for key in flat
        if (m := re.match(r"OSAG_(\d+)\.", key))
    })
    for g in groups:
        gp, gs = f"residual_layer.{g}", f"OSAG_{g}"
        blocks = sorted({
            int(m.group(1)) for key in flat
            if (m := re.match(rf"OSAG_{g}\.OSABlock_(\d+)\.", key))
        })
        for i in blocks:
            tp = f"{gp}.residual_layer.{i}.layer"
            sc = f"{gs}.OSABlock_{i}"
            mb = f"{sc}.MBConv_0"
            _get_conv(flat, f"{mb}.Conv2d_0", out, f"{tp}.0.fn.0")
            _get_raw_conv(flat, f"{mb}.Conv_0", out, f"{tp}.0.fn.2")
            se = f"{mb}.SqueezeExcitation_0"
            _get_dense(flat, f"{se}.Dense_0", out, f"{tp}.0.fn.4.gate.1")
            _get_dense(flat, f"{se}.Dense_1", out, f"{tp}.0.fn.4.gate.3")
            _get_conv(flat, f"{mb}.Conv2d_1", out, f"{tp}.0.fn.5")

            def attn(our: str, t: str) -> None:
                _get_dense(flat, f"{our}.Dense_0", out, f"{t}.fn.to_qkv")
                _get_dense(flat, f"{our}.Dense_1", out, f"{t}.fn.to_out.0")
                out[f"{t}.fn.rel_pos_bias.weight"] = flat[f"{our}.rel_pos_bias"]

            def ffn(our: str, t: str) -> None:
                _get_conv(flat, f"{our}.Conv2d_0", out, f"{t}.fn.project_in")
                _get_raw_conv(flat, f"{our}.Conv_0", out, f"{t}.fn.dwconv")
                _get_conv(flat, f"{our}.Conv2d_1", out, f"{t}.fn.project_out")

            def chan(our: str, t: str) -> None:
                out[f"{t}.fn.temperature"] = flat[f"{our}.temperature"]
                _get_conv(flat, f"{our}.Conv2d_0", out, f"{t}.fn.qkv")
                _get_raw_conv(flat, f"{our}.Conv_0", out, f"{t}.fn.qkv_dwconv")
                _get_conv(flat, f"{our}.Conv2d_1", out, f"{t}.fn.project_out")

            for ln_i, layer_i in enumerate((2, 4, 5, 6, 8, 10, 11, 12)):
                _get_ln(flat, f"{sc}.LayerNorm_{ln_i}", out, f"{tp}.{layer_i}.norm")
            attn(f"{sc}.WindowAttentionPE_0", f"{tp}.2")
            ffn(f"{sc}.GatedConvFFN_0", f"{tp}.4")
            chan(f"{sc}.ChannelAttention_0", f"{tp}.5")
            ffn(f"{sc}.GatedConvFFN_1", f"{tp}.6")
            attn(f"{sc}.WindowAttentionPE_1", f"{tp}.8")
            ffn(f"{sc}.GatedConvFFN_2", f"{tp}.10")
            chan(f"{sc}.ChannelAttention_1", f"{tp}.11")
            ffn(f"{sc}.GatedConvFFN_3", f"{tp}.12")
        _get_conv(flat, f"{gs}.Conv2d_0", out,
                  f"{gp}.residual_layer.{max(blocks) + 1}")
        esa = f"{gs}.ESA_0"
        _get_conv(flat, f"{esa}.Conv2d_0", out, f"{gp}.esa.conv1")
        _get_raw_conv(flat, f"{esa}.Conv_0", out, f"{gp}.esa.conv2")
        _get_conv(flat, f"{esa}.Conv2d_1", out, f"{gp}.esa.conv3")
        _get_conv(flat, f"{esa}.Conv2d_2", out, f"{gp}.esa.conv_f")
        _get_conv(flat, f"{esa}.Conv2d_3", out, f"{gp}.esa.conv4")
    return out


EXT_EXPORTERS["omnisr"] = export_omnisr


def export_hitsrf(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_hitsrf (uniform depths reconstruction, like
    srformer — true for all three reference presets)."""
    from neosr_tpu.utils.torch_interop import _get_conv, _get_dense, _get_ln

    out: dict[str, np.ndarray] = {}
    n_blocks = len({
        int(m.group(1)) for key in flat
        if (m := re.match(r"HierarchicalBlock_(\d+)\.", key))
    })
    tops = {
        int(m.group(1)) for key in flat
        if (m := re.fullmatch(r"Conv2d_(\d+)\.Conv_0\.kernel", key))
    }
    ps_head = any(key.startswith("Upsample_0.") for key in flat)
    ng = len(tops) - (4 if ps_head else 3)
    per = n_blocks // ng
    if per * ng != n_blocks:
        msg = "hit_srf export requires uniform depths across groups"
        raise ValueError(msg)

    _get_conv(flat, "Conv2d_0", out, "conv_first")
    if "LayerNorm_0.scale" in flat:
        _get_ln(flat, "LayerNorm_0", out, "patch_embed.norm")
    _get_ln(flat, "LayerNorm_1", out, "norm")
    for g in range(ng):
        for i in range(per):
            tp = f"layers.{g}.residual_group.blocks.{i}"
            sc = f"HierarchicalBlock_{g * per + i}"
            _get_ln(flat, f"{sc}.LayerNorm_0", out, f"{tp}.norm1")
            _get_ln(flat, f"{sc}.LayerNorm_1", out, f"{tp}.norm2")
            scc = f"{sc}.SCC_0"
            dfe = f"{scc}.DFE_0"
            _get_conv(flat, f"{dfe}.Conv2d_0", out, f"{tp}.correlation.qv.conv.0")
            _get_conv(flat, f"{dfe}.Conv2d_1", out, f"{tp}.correlation.qv.conv.2")
            _get_conv(flat, f"{dfe}.Conv2d_2", out, f"{tp}.correlation.qv.conv.4")
            _get_conv(flat, f"{dfe}.Conv2d_3", out, f"{tp}.correlation.qv.linear")
            _get_dense(flat, f"{scc}.spatial_linear", out,
                       f"{tp}.correlation.spatial_linear")
            pos = f"{scc}.DynamicPosBias_0"
            ptp = f"{tp}.correlation.pos"
            _get_dense(flat, f"{pos}.Dense_0", out, f"{ptp}.pos_proj")
            for n in range(1, 4):
                _get_ln(flat, f"{pos}.LayerNorm_{n - 1}", out, f"{ptp}.pos{n}.0")
                _get_dense(flat, f"{pos}.Dense_{n}", out, f"{ptp}.pos{n}.2")
            _get_dense(flat, f"{scc}.Dense_0", out, f"{tp}.correlation.proj")
            ffn = f"{sc}.ConvFFN_0"
            _get_dense(flat, f"{ffn}.Dense_0", out, f"{tp}.mlp.fc1")
            out[f"{tp}.mlp.dwconv.depthwise_conv.0.weight"] = np.ascontiguousarray(
                np.transpose(flat[f"{ffn}.Conv_0.kernel"], (3, 2, 0, 1)))
            out[f"{tp}.mlp.dwconv.depthwise_conv.0.bias"] = flat[f"{ffn}.Conv_0.bias"]
            _get_dense(flat, f"{ffn}.Dense_1", out, f"{tp}.mlp.fc2")
        _get_conv(flat, f"Conv2d_{g + 1}", out, f"layers.{g}.conv")
    _get_conv(flat, f"Conv2d_{ng + 1}", out, "conv_after_body")
    if ps_head:
        _get_conv(flat, f"Conv2d_{ng + 2}", out, "conv_before_upsample.0")
        k = 0
        while f"Upsample_0.Conv2d_{k}.Conv_0.kernel" in flat:
            _get_conv(flat, f"Upsample_0.Conv2d_{k}", out, f"upsample.{2 * k}")
            k += 1
        _get_conv(flat, f"Conv2d_{ng + 3}", out, "conv_last")
    else:
        _get_conv(flat, f"Conv2d_{ng + 2}", out, "upsample.0")
    return out


EXT_EXPORTERS["hit_srf"] = export_hitsrf


def export_rgt(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_rgt (uniform depths reconstruction; even blocks
    L_SA, odd RG_SA — the reference's fixed alternation)."""
    from neosr_tpu.utils.torch_interop import _get_conv, _get_dense, _get_ln

    out: dict[str, np.ndarray] = {}
    n_blocks = len({
        int(m.group(1)) for key in flat
        if (m := re.match(r"RGTBlock_(\d+)\.", key))
    })
    tops = {
        int(m.group(1)) for key in flat
        if (m := re.fullmatch(r"Conv2d_(\d+)\.Conv_0\.kernel", key))
    }
    ng = len(tops) - 4  # conv_first + per-group + after_body + before_up + last
    per = n_blocks // ng
    if per * ng != n_blocks:
        msg = "rgt export requires uniform depths across groups"
        raise ValueError(msg)
    _get_conv(flat, "Conv2d_0", out, "conv_first")
    _get_ln(flat, "LayerNorm_0", out, "before_RG.1")
    _get_ln(flat, "LayerNorm_1", out, "norm")
    for g in range(ng):
        for i in range(per):
            tp, sc = f"layers.{g}.blocks.{i}", f"RGTBlock_{g * per + i}"
            out[f"{tp}.gamma"] = flat[f"{sc}.gamma"]
            _get_ln(flat, f"{sc}.LayerNorm_0", out, f"{tp}.norm1")
            _get_ln(flat, f"{sc}.LayerNorm_1", out, f"{tp}.norm2")
            if f"{sc}.L_SA_0.Dense_0.kernel" in flat:
                attn = f"{sc}.L_SA_0"
                _get_dense(flat, f"{attn}.Dense_0", out, f"{tp}.attn.qkv")
                _get_dense(flat, f"{attn}.Dense_1", out, f"{tp}.attn.proj")
                _get_raw_conv(flat, f"{attn}.Conv_0", out, f"{tp}.attn.get_v")
                for br in (0, 1):
                    pos = f"{attn}.SpatialAttentionBranch_{br}.DynamicPosBias_0"
                    ptp = f"{tp}.attn.attns.{br}.pos"
                    _get_dense(flat, f"{pos}.Dense_0", out, f"{ptp}.pos_proj")
                    for n in range(1, 4):
                        _get_ln(flat, f"{pos}.LayerNorm_{n - 1}", out,
                                f"{ptp}.pos{n}.0")
                        _get_dense(flat, f"{pos}.Dense_{n}", out, f"{ptp}.pos{n}.2")
            else:
                attn = f"{sc}.RG_SA_0"
                _get_raw_conv(flat, f"{attn}.Conv_0", out, f"{tp}.attn.reduction1")
                _get_raw_conv(flat, f"{attn}.Conv_1", out, f"{tp}.attn.dwconv")
                _get_conv(flat, f"{attn}.Conv2d_0", out, f"{tp}.attn.conv")
                _get_ln(flat, f"{attn}.LayerNorm_0", out, f"{tp}.attn.norm_act.0")
                _get_dense(flat, f"{attn}.Dense_0", out, f"{tp}.attn.q")
                _get_dense(flat, f"{attn}.Dense_1", out, f"{tp}.attn.k")
                _get_dense(flat, f"{attn}.Dense_2", out, f"{tp}.attn.v")
                _get_raw_conv(flat, f"{attn}.Conv_2", out, f"{tp}.attn.cpe")
                _get_dense(flat, f"{attn}.Dense_3", out, f"{tp}.attn.proj")
            ffn = f"{sc}.SGFN_0"
            _get_dense(flat, f"{ffn}.Dense_0", out, f"{tp}.mlp.fc1")
            _get_ln(flat, f"{ffn}.LayerNorm_0", out, f"{tp}.mlp.sg.norm")
            _get_raw_conv(flat, f"{ffn}.Conv_0", out, f"{tp}.mlp.sg.conv")
            _get_dense(flat, f"{ffn}.Dense_1", out, f"{tp}.mlp.fc2")
        _get_conv(flat, f"Conv2d_{g + 1}", out, f"layers.{g}.conv")
    _get_conv(flat, f"Conv2d_{ng + 1}", out, "conv_after_body")
    _get_conv(flat, f"Conv2d_{ng + 2}", out, "conv_before_upsample.0")
    k = 0
    while f"Upsample_0.Conv2d_{k}.Conv_0.kernel" in flat:
        _get_conv(flat, f"Upsample_0.Conv2d_{k}", out, f"upsample.{2 * k}")
        k += 1
    _get_conv(flat, f"Conv2d_{ng + 3}", out, "conv_last")
    return out


EXT_EXPORTERS["rgt"] = export_rgt


def export_grformer(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_grformer (uniform depths reconstruction)."""
    from neosr_tpu.utils.torch_interop import _get_conv, _get_dense, _get_ln

    out: dict[str, np.ndarray] = {}
    n_blocks = len({
        int(m.group(1)) for key in flat
        if (m := re.match(r"GRSAB_(\d+)\.", key))
    })
    tops = {
        int(m.group(1)) for key in flat
        if (m := re.fullmatch(r"Conv2d_(\d+)\.Conv_0\.kernel", key))
    }
    ng = len(tops) - 3  # conv_first + per-group + after_body + upsample.0
    per = n_blocks // ng
    if per * ng != n_blocks:
        msg = "grformer export requires uniform depths across groups"
        raise ValueError(msg)
    _get_conv(flat, "Conv2d_0", out, "conv_first")
    _get_ln(flat, "LayerNorm_0", out, "norm")
    for g in range(ng):
        for i in range(per):
            tp, sc = f"layers.{g}.blocks.{i}", f"GRSAB_{g * per + i}"
            _get_ln(flat, f"{sc}.LayerNorm_0", out, f"{tp}.norm1")
            _get_ln(flat, f"{sc}.LayerNorm_1", out, f"{tp}.norm2")
            attn = f"{sc}.GRSA_0"
            for name in ("q1", "q2", "k1", "k2", "v1", "v2"):
                _get_dense(flat, f"{attn}.{name}", out, f"{tp}.attn.{name}")
            out[f"{tp}.attn.logit_scale"] = flat[f"{attn}.logit_scale"]
            _get_dense(flat, f"{attn}.Dense_0", out, f"{tp}.attn.ESRPB_MLP.0")
            _get_dense(flat, f"{attn}.Dense_1", out, f"{tp}.attn.ESRPB_MLP.2")
            _get_dense(flat, f"{attn}.Dense_2", out, f"{tp}.attn.proj1")
            _get_dense(flat, f"{attn}.Dense_3", out, f"{tp}.attn.proj2")
            _get_dense(flat, f"{sc}.Dense_0", out, f"{tp}.mlp.fc1")
            _get_raw_conv(flat, f"{sc}.Conv_0", out,
                          f"{tp}.mlp.dwconv.depthwise_conv.0")
            _get_raw_conv(flat, f"{sc}.Conv_1", out,
                          f"{tp}.mlp.dwconv.depthwise_conv.2")
            _get_dense(flat, f"{sc}.Dense_1", out, f"{tp}.mlp.fc2")
        _get_conv(flat, f"Conv2d_{g + 1}", out, f"layers.{g}.conv")
    _get_conv(flat, f"Conv2d_{ng + 1}", out, "conv_after_body")
    _get_conv(flat, f"Conv2d_{ng + 2}", out, "upsample.0")
    return out


EXT_EXPORTERS["grformer"] = export_grformer


def export_hma(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_hma.  Uniform depths reconstruction; per group of
    depth d the torch `blocks` Sequential interleaves FusedConv (before
    even-indexed FABs) and FABs: FC,FAB,FAB,FC,FAB,FAB,..."""
    from neosr_tpu.utils.torch_interop import _get_conv, _get_dense, _get_ln

    out: dict[str, np.ndarray] = {}
    n_fab = len({
        int(m.group(1)) for key in flat if (m := re.match(r"FAB_(\d+)\.", key))
    })
    ng = len({
        int(m.group(1)) for key in flat if (m := re.match(r"GAB_(\d+)\.", key))
    })
    per = n_fab // ng
    if per * ng != n_fab:
        msg = "hma export requires uniform depths across groups"
        raise ValueError(msg)

    def win_attn(our: str, t: str) -> None:
        out[f"{t}.relative_position_bias_table"] = flat[
            f"{our}.relative_position_bias_table"]
        _get_dense(flat, f"{our}.Dense_0", out, f"{t}.proj")

    def pos_bias(our: str, t: str) -> None:
        _get_dense(flat, f"{our}.Dense_0", out, f"{t}.pos_proj")
        for n in range(1, 4):
            _get_ln(flat, f"{our}.LayerNorm_{n - 1}", out, f"{t}.pos{n}.0")
            _get_dense(flat, f"{our}.Dense_{n}", out, f"{t}.pos{n}.2")

    _get_conv(flat, "Conv2d_0", out, "conv_first")
    if "LayerNorm_0.scale" in flat:
        _get_ln(flat, "LayerNorm_0", out, "patch_embed.norm")
    _get_ln(flat, "LayerNorm_1", out, "norm")
    n_fc = fab_i = 0
    for g in range(ng):
        gp = f"layers.{g}.residual_group"
        j = 0
        for i in range(per):
            if i % 2 == 0:
                tp, sc = f"{gp}.blocks.{j}", f"FusedConv_{n_fc}"
                n_fc += 1
                j += 1
                _get_ln(flat, f"{sc}.LayerNorm_0", out, f"{tp}.pre_norm")
                _get_conv(flat, f"{sc}.Conv2d_0", out, f"{tp}.fused_conv")
                _get_ln(flat, f"{sc}.LayerNorm_1", out, f"{tp}.norm1")
                _get_conv(flat, f"{sc}.Conv2d_1", out, f"{tp}.se.fc1")
                _get_conv(flat, f"{sc}.Conv2d_2", out, f"{tp}.se.fc2")
                _get_conv(flat, f"{sc}.Conv2d_3", out, f"{tp}.conv3_1x1")
            tp, sc = f"{gp}.blocks.{j}", f"FAB_{fab_i}"
            fab_i += 1
            j += 1
            _get_ln(flat, f"{sc}.LayerNorm_0", out, f"{tp}.norm1")
            _get_dense(flat, f"{sc}.Dense_0", out, f"{tp}.qkv")
            win_attn(f"{sc}.WindowAttentionQKV_0", f"{tp}.attn")
            _get_ln(flat, f"{sc}.LayerNorm_1", out, f"{tp}.norm2")
            _get_dense(flat, f"{sc}.Mlp_0.Dense_0", out, f"{tp}.mlp.fc1")
            _get_dense(flat, f"{sc}.Mlp_0.Dense_1", out, f"{tp}.mlp.fc2")
        gab = f"GAB_{g}"
        _get_dense(flat, f"{gab}.Dense_0", out, f"{gp}.gab.qkv")
        _get_dense(flat, f"{gab}.Dense_1", out, f"{gp}.gab.grid_proj")
        pos_bias(f"{gab}.AffineTransform_0.DynamicPosBias_0",
                 f"{gp}.gab.grid_attn.attn_transform1.pos")
        pos_bias(f"{gab}.AffineTransform_1.DynamicPosBias_0",
                 f"{gp}.gab.grid_attn.attn_transform2.pos")
        win_attn(f"{gab}.WindowAttentionQKV_0", f"{gp}.gab.window_attn")
        win_attn(f"{gab}.WindowAttentionQKV_1", f"{gp}.gab.window_attn_s")
        _get_dense(flat, f"{gab}.Dense_2", out, f"{gp}.gab.fc")
        _get_ln(flat, f"{gab}.LayerNorm_0", out, f"{gp}.gab.norm1")
        _get_ln(flat, f"{gab}.LayerNorm_1", out, f"{gp}.gab.norm2")
        _get_dense(flat, f"{gab}.Mlp_0.Dense_0", out, f"{gp}.gab.mlp.fc1")
        _get_dense(flat, f"{gab}.Mlp_0.Dense_1", out, f"{gp}.gab.mlp.fc2")
        out[f"{gp}.scale"] = flat[f"group_scale_{g}"]
        _get_conv(flat, f"Conv2d_{g + 1}", out, f"layers.{g}.conv")
    _get_conv(flat, f"Conv2d_{ng + 1}", out, "conv_after_body")
    _get_conv(flat, f"Conv2d_{ng + 2}", out, "conv_before_upsample.0")
    k = 0
    while f"Upsample_0.Conv2d_{k}.Conv_0.kernel" in flat:
        _get_conv(flat, f"Upsample_0.Conv2d_{k}", out, f"upsample.{2 * k}")
        k += 1
    _get_conv(flat, f"Conv2d_{ng + 3}", out, "conv_last")
    return out


EXT_EXPORTERS["hma"] = export_hma


def export_ditn(flat: dict[str, np.ndarray],
                ufone_blocks: int = 1) -> dict[str, np.ndarray]:
    """Inverse of convert_ditn.  The UFONE count cannot be recovered from
    flat params alone (only ITL/SAL totals are visible); defaults to the
    reference's registered preset (UFONE_blocks=1, ditn_arch.py:267).  The
    reference ISA's dead `temperature` parameter is not emitted (its
    forward discards it) — strict loads should allow it missing."""
    from neosr_tpu.utils.torch_interop import _get_conv, _get_dense

    out: dict[str, np.ndarray] = {}
    _get_conv(flat, "Conv2d_0", out, "sft")

    def ffn(sc: str, tp: str) -> None:
        _get_conv(flat, f"{sc}.Conv2d_0", out, f"{tp}.project_in")
        _get_raw_conv(flat, f"{sc}.Conv_0", out, f"{tp}.dwconv")
        _get_conv(flat, f"{sc}.Conv2d_1", out, f"{tp}.project_out")

    total_itl = len({
        int(m.group(1)) for key in flat if (m := re.match(r"ITL_(\d+)\.", key))
    })
    total_sal = len({
        int(m.group(1)) for key in flat if (m := re.match(r"SAL_(\d+)\.", key))
    })
    u_n = ufone_blocks
    n_itl, n_sal = total_itl // u_n, total_sal // u_n
    for u in range(u_n):
        for i in range(n_itl):
            tp, sc = f"UFONE.{u}.ITLs.{i}", f"ITL_{u * n_itl + i}"
            _get_conv(flat, f"{sc}.Conv2d_0", out, f"{tp}.conv1")
            _get_dense(flat, f"{sc}.ISA_0.Dense_0", out, f"{tp}.attn.qkv")
            _get_conv(flat, f"{sc}.ISA_0.Conv2d_0", out, f"{tp}.attn.project_out")
            _get_conv(flat, f"{sc}.Conv2d_1", out, f"{tp}.conv2")
            ffn(f"{sc}.FeedForward_0", f"{tp}.ffn")
        for j in range(n_sal):
            tp, sc = f"UFONE.{u}.SALs.{j}", f"SAL_{u * n_sal + j}"
            _get_conv(flat, f"{sc}.Conv2d_0", out, f"{tp}.conv1")
            sda = f"{sc}.SDA_0"
            _get_scale(flat, f"{sda}.scale", out, f"{tp}.SDA.scale")
            _get_conv(flat, f"{sda}.Conv2d_0", out, f"{tp}.SDA.proj_first.0")
            _get_raw_conv(flat, f"{sda}.Conv_0", out, f"{tp}.SDA.DConvs.0")
            _get_raw_conv(flat, f"{sda}.Conv_1", out, f"{tp}.SDA.DConvs.1")
            _get_conv(flat, f"{sda}.Conv2d_1", out, f"{tp}.SDA.DConvs.2")
            _get_conv(flat, f"{sda}.Conv2d_2", out, f"{tp}.SDA.proj_last.0")
            _get_conv(flat, f"{sc}.Conv2d_1", out, f"{tp}.conv2")
            ffn(f"{sc}.FeedForward_0", f"{tp}.ffn")
    _get_conv(flat, "Conv2d_1", out, "conv_after_body")
    _get_conv(flat, "Conv2d_2", out, "upsample.0")
    return out


EXT_EXPORTERS["ditn"] = export_ditn


def export_msdan(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_msdan (key-syntax rewrite).  The reference
    constructs BOTH x2 and x3 upsampler stages; only the stage matching the
    trained scale exists in our params — strict loads should allow the
    unused stage missing."""
    from neosr_tpu.utils.torch_interop import _ik

    ups_mods = ("BSConv_2", "BSConv1_2", "BSConv_3", "BSConv1_3")
    out: dict[str, np.ndarray] = {}
    for key, val in flat.items():
        parts = key.split(".")
        if m := re.fullmatch(r"DFEB_(\d+)", parts[0]):
            parts[0:1] = ["layers", m.group(1)]
        elif parts[0] in ups_mods:
            parts.insert(0, "upsampler")
        if parts[-1] == "kernel":
            val = _ik(val)
            parts[-1] = "weight"
            if parts[-2] == "Conv_0":
                parts.pop(-2)
        elif parts[-1] == "bias" and parts[-2] == "Conv_0":
            parts.pop(-2)
        out[".".join(parts)] = np.asarray(val)
    return out


EXT_EXPORTERS["msdan"] = export_msdan


def export_craft(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_craft (model-level rpe/mask buffers not emitted).
    Note the reference cannot torch.onnx-export craft; the .pth layout is
    still useful for ecosystem checkpoint interop."""
    from neosr_tpu.utils.torch_interop import _get_conv, _get_dense, _get_ln

    out: dict[str, np.ndarray] = {}
    _get_conv(flat, "Conv2d_0", out, "conv_first")
    _get_ln(flat, "LayerNorm_0", out, "norm.body")
    ng = len({
        int(m.group(1)) for key in flat if (m := re.match(r"CRFB_(\d+)\.", key))
    })
    for g in range(ng):
        gp, gs = f"layers.{g}.residual_group", f"CRFB_{g}"
        n_srwa = len({
            int(m.group(1)) for key in flat
            if (m := re.match(rf"CRFB_{g}\.SRWAB_(\d+)\.", key))
        })
        for j in range(n_srwa):
            tp, sc = f"{gp}.srwa_blocks.{j}", f"{gs}.SRWAB_{j}"
            _get_ln(flat, f"{sc}.LayerNorm_0", out, f"{tp}.norm1")
            _get_ln(flat, f"{sc}.LayerNorm_1", out, f"{tp}.norm2")
            lsa = f"{sc}.L_SA_0"
            _get_dense(flat, f"{lsa}.Dense_0", out, f"{tp}.qkv")
            _get_dense(flat, f"{lsa}.Dense_1", out, f"{tp}.proj")
            _get_raw_conv(flat, f"{lsa}.Conv_0", out, f"{tp}.get_v")
            for br in (0, 1):
                pos = f"{lsa}.SpatialAttentionBranch_{br}.DynamicPosBias_0"
                ptp = f"{tp}.attns.{br}.pos"
                _get_dense(flat, f"{pos}.Dense_0", out, f"{ptp}.pos_proj")
                for n in range(1, 4):
                    _get_ln(flat, f"{pos}.LayerNorm_{n - 1}", out,
                            f"{ptp}.pos{n}.0")
                    _get_dense(flat, f"{pos}.Dense_{n}", out, f"{ptp}.pos{n}.2")
            _get_dense(flat, f"{sc}.Mlp_0.Dense_0", out, f"{tp}.mlp.fc1")
            _get_dense(flat, f"{sc}.Mlp_0.Dense_1", out, f"{tp}.mlp.fc2")
        for i in range(n_srwa // 2):
            tp, sc = f"{gp}.hfer_blocks.{i}", f"{gs}.HFERB_{i}"
            _get_conv(flat, f"{sc}.Conv2d_0", out, f"{tp}.conv")
            _get_conv(flat, f"{sc}.Conv2d_1", out, f"{tp}.fc")
            _get_conv(flat, f"{sc}.Conv2d_2", out, f"{tp}.last_fc")
            tp, sc = f"{gp}.hf_blocks.{i}", f"{gs}.HFB_{i}"
            _get_ln(flat, f"{sc}.LayerNorm_0", out, f"{tp}.norm1.body")
            _get_ln(flat, f"{sc}.LayerNorm_1", out, f"{tp}.norm2.body")
            out[f"{tp}.attn.temperature"] = flat[f"{sc}.temperature"]
            _get_conv(flat, f"{sc}.Conv2d_0", out, f"{tp}.attn.q")
            _get_raw_conv(flat, f"{sc}.Conv_0", out, f"{tp}.attn.q_dwconv")
            _get_conv(flat, f"{sc}.Conv2d_1", out, f"{tp}.attn.kv")
            _get_raw_conv(flat, f"{sc}.Conv_1", out, f"{tp}.attn.kv_dwconv")
            _get_conv(flat, f"{sc}.Conv2d_2", out, f"{tp}.attn.project_out")
            _get_conv(flat, f"{sc}.Conv2d_3", out, f"{tp}.ffn.project_in")
            _get_raw_conv(flat, f"{sc}.Conv_2", out, f"{tp}.ffn.dwconv")
            _get_conv(flat, f"{sc}.Conv2d_4", out, f"{tp}.ffn.project_out")
        _get_conv(flat, f"Conv2d_{g + 1}", out, f"layers.{g}.conv")
    _get_conv(flat, f"Conv2d_{ng + 1}", out, "conv_after_body")
    _get_conv(flat, f"Conv2d_{ng + 2}", out, "upsample.0")
    return out


EXT_EXPORTERS["craft"] = export_craft


# ------------------------------------------------- BN-family exporters
# Inverses of convert_eimn / convert_dat / convert_dctlsa.  Running
# statistics are read from the `batch_stats::` side-channel that
# to_torch_state_dict(batch_stats=...) merges into the flat dict.


def export_eimn(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """EIMN (reference eimn_arch.py:48-319).  Stage depths are uniform in
    every reference preset (eimn_a/eimn_l: depths is a single int), so the
    flat EIMNBlock numbering splits evenly across the norm{s} stages."""
    from neosr_tpu.utils.torch_interop import _get_conv, _get_dense, _get_ln

    out: dict[str, np.ndarray] = {}
    _get_conv(flat, "Conv2d_0", out, "head.0")
    _get_conv(flat, "Conv2d_1", out, "tail.0")
    n_stages = len({
        int(m.group(1)) for k in flat
        if (m := re.fullmatch(r"LayerNorm_(\d+)\.scale", k))
    })
    n_blocks = len({
        int(m.group(1)) for k in flat
        if (m := re.match(r"EIMNBlock_(\d+)\.", k))
    })
    if n_stages == 0 or n_blocks % n_stages:
        msg = f"eimn export: {n_blocks} blocks not uniform over {n_stages} stages"
        raise ValueError(msg)
    depth = n_blocks // n_stages
    blk = 0
    for s in range(1, n_stages + 1):
        for j in range(depth):
            sc, tp = f"EIMNBlock_{blk}", f"block{s}.{j}"
            blk += 1
            out[f"{tp}.layer_scale_1"] = flat[f"{sc}.layer_scale_1"]
            out[f"{tp}.layer_scale_2"] = flat[f"{sc}.layer_scale_2"]
            for n, norm in enumerate(("norm1", "norm2")):
                _get_bn(flat, f"{sc}.BatchStatNorm_{n}", out, f"{tp}.{norm}")
            attn = f"{sc}.MOLRCM_0"
            _get_conv(flat, f"{attn}.Conv2d_0", out, f"{tp}.attn.proj_value.0")
            _get_conv(flat, f"{attn}.Conv2d_1", out, f"{tp}.attn.proj_query.0")
            _get_raw_conv(flat, f"{attn}.Conv_0", out, f"{tp}.attn.region")
            _get_raw_conv(flat, f"{attn}.Conv_1", out, f"{tp}.attn.spatial_1")
            _get_raw_conv(flat, f"{attn}.Conv_2", out, f"{tp}.attn.spatial_2")
            _get_conv(flat, f"{attn}.Conv2d_2", out, f"{tp}.attn.fusion")
            _get_conv(flat, f"{attn}.Conv2d_3", out, f"{tp}.attn.out")
            mlp = f"{sc}.SADFFM_0"
            _get_conv(flat, f"{mlp}.Conv2d_0", out, f"{tp}.mlp.linear_in")
            _get_raw_conv(flat, f"{mlp}.Conv_0", out, f"{tp}.mlp.SAL")
            _get_conv(flat, f"{mlp}.Conv2d_1", out, f"{tp}.mlp.linear_out")
            dffm = f"{mlp}.DFFM_0"
            _get_ln(flat, f"{dffm}.LayerNorm_0", out, f"{tp}.mlp.DFFM.norm")
            _get_conv(flat, f"{dffm}.Conv2d_0", out, f"{tp}.mlp.DFFM.global_reduce")
            _get_conv(flat, f"{dffm}.Conv2d_1", out, f"{tp}.mlp.DFFM.local_reduce")
            _get_conv(flat, f"{dffm}.Conv2d_2", out, f"{tp}.mlp.DFFM.channel_expand")
            _get_conv(flat, f"{dffm}.Conv2d_3", out, f"{tp}.mlp.DFFM.spatial_expand")
        _get_ln(flat, f"LayerNorm_{s - 1}", out, f"norm{s}")
    return out


EXT_EXPORTERS["eimn"] = export_eimn


def export_dat(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """DAT (reference dat_arch.py:42-1122).  Group depths are uniform in
    every reference preset (dat/dat_2/dat_s/dat_light use depth=[k]*n), so
    the flat DATB numbering splits evenly over the residual groups; the
    spatial/channel alternation is recovered per block from the attention
    scope actually present."""
    from neosr_tpu.utils.torch_interop import _get_conv, _get_dense, _get_ln

    out: dict[str, np.ndarray] = {}
    _get_conv(flat, "Conv2d_0", out, "conv_first")
    _get_ln(flat, "LayerNorm_0", out, "before_RG.1")
    pixelshuffle = any(k.startswith("Upsample_0.") for k in flat)
    conv_idx = {
        int(m.group(1)) for k in flat
        if (m := re.match(r"Conv2d_(\d+)\.", k))
    }
    ng = max(conv_idx) - (3 if pixelshuffle else 2)
    n_blocks = len({
        int(m.group(1)) for k in flat if (m := re.match(r"DATB_(\d+)\.", k))
    })
    if ng <= 0 or n_blocks % ng:
        msg = f"dat export: {n_blocks} blocks not uniform over {ng} groups"
        raise ValueError(msg)
    depth = n_blocks // ng
    blk = 0
    for g in range(ng):
        for _ in range(depth):
            sc, tp = f"DATB_{blk}", f"layers.{g}.blocks.{blk % depth}"
            blk += 1
            _get_ln(flat, f"{sc}.LayerNorm_0", out, f"{tp}.norm1")
            _get_ln(flat, f"{sc}.LayerNorm_1", out, f"{tp}.norm2")
            spatial = any(
                k.startswith(f"{sc}.AxialSpatialAttention_0.") for k in flat
            )
            attn = (f"{sc}.AxialSpatialAttention_0" if spatial
                    else f"{sc}.AxialChannelAttention_0")
            _get_dense(flat, f"{attn}.Dense_0", out, f"{tp}.attn.qkv")
            _get_dense(flat, f"{attn}.Dense_1", out, f"{tp}.attn.proj")
            if spatial:
                for br in (0, 1):
                    pos = f"{attn}.SpatialAttentionBranch_{br}.DynamicPosBias_0"
                    ptp = f"{tp}.attn.attns.{br}.pos"
                    _get_dense(flat, f"{pos}.Dense_0", out, f"{ptp}.pos_proj")
                    for n in range(1, 4):
                        _get_ln(flat, f"{pos}.LayerNorm_{n - 1}", out,
                                f"{ptp}.pos{n}.0")
                        _get_dense(flat, f"{pos}.Dense_{n}", out,
                                   f"{ptp}.pos{n}.2")
            else:
                out[f"{tp}.attn.temperature"] = flat[f"{attn}.temperature"]
            _get_raw_conv(flat, f"{attn}.Conv_0", out, f"{tp}.attn.dwconv.0")
            _get_bn(flat, f"{attn}.BatchStatNorm_0", out, f"{tp}.attn.dwconv.1")
            _get_conv(flat, f"{attn}.Conv2d_0", out,
                      f"{tp}.attn.channel_interaction.1")
            _get_bn(flat, f"{attn}.BatchStatNorm_1", out,
                    f"{tp}.attn.channel_interaction.2")
            _get_conv(flat, f"{attn}.Conv2d_1", out,
                      f"{tp}.attn.channel_interaction.4")
            _get_conv(flat, f"{attn}.Conv2d_2", out,
                      f"{tp}.attn.spatial_interaction.0")
            _get_bn(flat, f"{attn}.BatchStatNorm_2", out,
                    f"{tp}.attn.spatial_interaction.1")
            _get_conv(flat, f"{attn}.Conv2d_3", out,
                      f"{tp}.attn.spatial_interaction.3")
            ffn = f"{sc}.SGFN_0"
            _get_dense(flat, f"{ffn}.Dense_0", out, f"{tp}.ffn.fc1")
            _get_ln(flat, f"{ffn}.LayerNorm_0", out, f"{tp}.ffn.sg.norm")
            _get_raw_conv(flat, f"{ffn}.Conv_0", out, f"{tp}.ffn.sg.conv")
            _get_dense(flat, f"{ffn}.Dense_1", out, f"{tp}.ffn.fc2")
        _get_conv(flat, f"Conv2d_{g + 1}", out, f"layers.{g}.conv")
    _get_ln(flat, "LayerNorm_1", out, "norm")
    _get_conv(flat, f"Conv2d_{ng + 1}", out, "conv_after_body")
    if pixelshuffle:
        _get_conv(flat, f"Conv2d_{ng + 2}", out, "conv_before_upsample.0")
        n_up = len({
            int(m.group(1)) for k in flat
            if (m := re.match(r"Upsample_0\.Conv2d_(\d+)\.", k))
        })
        # torch Upsample is Sequential(conv, PixelShuffle, conv, ...) so the
        # n-th conv sits at index 2n
        for n in range(n_up):
            _get_conv(flat, f"Upsample_0.Conv2d_{n}", out, f"upsample.{2 * n}")
        _get_conv(flat, f"Conv2d_{ng + 3}", out, "conv_last")
    else:
        _get_conv(flat, f"Conv2d_{ng + 2}", out, "upsample.0")
    return out


EXT_EXPORTERS["dat"] = export_dat


def export_dctlsa(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """DCTLSA (reference dctlsa_arch.py:12-593): fixed 2 SwinT x 2 blocks
    per LSAB group; group count recovered from the LSAB scopes."""
    from neosr_tpu.utils.torch_interop import _get_conv, _get_dense, _get_ln

    out: dict[str, np.ndarray] = {}
    _get_conv(flat, "Conv2d_0", out, "fea_conv")
    n_groups = len({
        int(m.group(1)) for k in flat if (m := re.match(r"LSAB_(\d+)\.", k))
    })
    for g in range(n_groups):
        for i in range(2):
            tp = f"B{g + 1}.body.{i}.transformer_body.0"
            sc = f"LSAB_{g}.SwinT_{i}"
            _get_ln(flat, f"{sc}.patch_norm", out, f"{tp}.patch_embed.norm")
            for j in range(2):
                btp = f"{tp}.blocks.{j}"
                bsc = f"{sc}.SwinTBlock_{j}"
                attn = f"{bsc}.LinearWindowAttention_0"
                _get_dense(flat, f"{attn}.Dense_0", out, f"{btp}.attn.qkv")
                _get_dense(flat, f"{attn}.Dense_1", out, f"{btp}.attn.proj")
                loc = f"{attn}.LocalModule_0"
                for n in range(2):
                    _get_bn(flat, f"{loc}.BatchStatNorm_{n}", out,
                            f"{btp}.attn.local.pointwise_prenorm_{n}")
                    _get_conv(flat, f"{loc}.Conv2d_{n}", out,
                              f"{btp}.attn.local.pointwise_conv_{n}")
                _get_raw_conv(flat, f"{loc}.Conv_0", out,
                              f"{btp}.attn.local.depthwise_conv")
                _get_dense(flat, f"{bsc}.Dense_0", out, f"{btp}.mlp.fc1")
                _get_dense(flat, f"{bsc}.Dense_1", out, f"{btp}.mlp.fc2")
    for n in range(1, n_groups):
        _get_conv(flat, f"Conv2d_{n}", out, f"c{n}.0")
    _get_conv(flat, f"Conv2d_{n_groups}", out, "c.0")
    _get_conv(flat, f"Conv2d_{n_groups + 1}", out, "LR_conv")
    _get_conv(flat, f"Conv2d_{n_groups + 2}", out, "upsampler.0")
    return out


EXT_EXPORTERS["dctlsa"] = export_dctlsa


# ---------------------------------------------------------------- discriminators
# net_d checkpoints (reference save format base.py:281-354): Real-ESRGAN
# U-Net (unet_arch.py:9-67) and pix2pixHD PatchGAN (patchgan_arch.py:34-146),
# so a GAN run warm-starts from reference-trained discriminators (and our
# discriminators export back into the torch ecosystem).  torch's hook-based
# spectral norm stores `weight_orig` plus persistent power-iteration buffers
# (`weight_u`/`weight_v`); our SNConv keeps the same persistent state in the
# "batch_stats" collection (discriminators.py), so u/v transfer both ways via
# the batch_stats:: side-channel and eval outputs reproduce exactly.  torch
# flattens the weight matrix OIHW -> (cout, cin*kh*kw) while our HWIO kernel
# reshapes to (kh*kw*cin, cout): u maps 1:1, v needs the (cin,kh,kw) ->
# (kh,kw,cin) reorder below.


def _v_to_ours(v: np.ndarray, w_oihw_shape: tuple) -> np.ndarray:
    _, cin, kh, kw = w_oihw_shape
    return np.ascontiguousarray(
        v.reshape(cin, kh, kw).transpose(1, 2, 0).reshape(-1))


def _v_to_torch(v: np.ndarray, w_hwio_shape: tuple) -> np.ndarray:
    kh, kw, cin, _ = w_hwio_shape
    return np.ascontiguousarray(
        v.reshape(kh, kw, cin).transpose(2, 0, 1).reshape(-1))


def _put_sn(out: dict, scope: str, sd: dict, tp: str) -> None:
    """One spectral-norm conv: weight_orig -> kernel, u/v -> batch_stats."""
    w = sd[f"{tp}.weight_orig"]
    out[f"{scope}.kernel"] = _k(w)
    if f"{tp}.weight_u" in sd:
        out[f"batch_stats::{scope}.u"] = np.asarray(sd[f"{tp}.weight_u"])
        out[f"batch_stats::{scope}.v"] = _v_to_ours(
            np.asarray(sd[f"{tp}.weight_v"]), w.shape)
    if f"{tp}.bias" in sd:
        out[f"{scope}.bias"] = sd[f"{tp}.bias"]


def convert_unet(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Reference Real-ESRGAN U-Net discriminator -> our flax `unet`."""
    out: dict[str, np.ndarray] = {}
    out["Conv_0.kernel"] = _k(sd["conv0.weight"])
    out["Conv_0.bias"] = sd["conv0.bias"]
    for i in range(8):
        tp = f"conv{i + 1}"
        if f"{tp}.weight_orig" in sd:
            _put_sn(out, f"SNConv_{i}", sd, tp)
        else:  # checkpoint saved without SN hooks
            out[f"SNConv_{i}.kernel"] = _k(sd[f"{tp}.weight"])
    out["Conv_1.kernel"] = _k(sd["conv9.weight"])
    out["Conv_1.bias"] = sd["conv9.bias"]
    return out


def _patchgan_torch_indices(num_layers: int) -> list[int]:
    """nn.Sequential indices of the conv layers (patchgan_arch.py:69-125):
    [first, strided x (num_layers-1), stride-1, final 1-ch]."""
    return ([0] + [3 * n - 1 for n in range(1, num_layers)]
            + [3 * num_layers - 1, 3 * num_layers + 2])


def convert_patchgan(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Reference pix2pixHD PatchGAN -> our flax `patchgan` (norm 'none')."""
    if any(k.endswith(".running_mean") for k in sd):
        msg = ("patchgan checkpoints with batch/instance norm layers are not "
               "supported (our patchgan implements the reference default "
               "norm_type='none', patchgan_arch.py:52)")
        raise ValueError(msg)
    conv_idx = sorted({
        int(m.group(1)) for k in sd if (m := re.match(r"model\.(\d+)\.weight", k))
    })
    out: dict[str, np.ndarray] = {}
    for j, i in enumerate(conv_idx):
        if f"model.{i}.weight_orig" in sd:
            _put_sn(out, f"SNConv_{j}", sd, f"model.{i}")
        else:
            out[f"Conv_{j}.kernel"] = _k(sd[f"model.{i}.weight"])
            if f"model.{i}.bias" in sd:
                out[f"Conv_{j}.bias"] = sd[f"model.{i}.bias"]
    return out


def _sn_uv(w_oihw: np.ndarray, iters: int = 100) -> tuple[np.ndarray, np.ndarray]:
    """Converged left/right singular vectors of the (O, I*H*W) weight matrix
    in torch's spectral-norm convention, for the exported u/v buffers."""
    m = w_oihw.reshape(w_oihw.shape[0], -1).astype(np.float64)
    u = np.ones(m.shape[0]) / np.sqrt(m.shape[0])
    for _ in range(iters):
        v = m.T @ u
        v /= np.linalg.norm(v) + 1e-12
        u = m @ v
        u /= np.linalg.norm(u) + 1e-12
    return u.astype(np.float32), v.astype(np.float32)


def _get_sn(flat: dict, scope: str, out: dict, tp: str) -> None:
    """Inverse of _put_sn: stored u/v ride out of the batch_stats::
    side-channel; when absent (plain params tree) converged vectors are
    synthesized so torch-side eval sees the true spectral estimate."""
    from neosr_tpu.utils.torch_interop import _ik

    w_hwio = flat[f"{scope}.kernel"]
    w = _ik(w_hwio)
    out[f"{tp}.weight_orig"] = w
    if f"batch_stats::{scope}.u" in flat:
        out[f"{tp}.weight_u"] = flat[f"batch_stats::{scope}.u"]
        out[f"{tp}.weight_v"] = _v_to_torch(
            flat[f"batch_stats::{scope}.v"], w_hwio.shape)
    else:
        out[f"{tp}.weight_u"], out[f"{tp}.weight_v"] = _sn_uv(w)
    if f"{scope}.bias" in flat:
        out[f"{tp}.bias"] = flat[f"{scope}.bias"]


def export_unet(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_unet (loads strict into the reference torch unet)."""
    from neosr_tpu.utils.torch_interop import _ik

    out: dict[str, np.ndarray] = {}
    out["conv0.weight"] = _ik(flat["Conv_0.kernel"])
    out["conv0.bias"] = flat["Conv_0.bias"]
    for i in range(8):
        _get_sn(flat, f"SNConv_{i}", out, f"conv{i + 1}")
    out["conv9.weight"] = _ik(flat["Conv_1.kernel"])
    out["conv9.bias"] = flat["Conv_1.bias"]
    return out


def export_patchgan(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_patchgan."""
    from neosr_tpu.utils.torch_interop import _ik

    sn = any(k.startswith("SNConv_") for k in flat)
    pref = "SNConv_" if sn else "Conv_"
    n_convs = len({k.split(".")[0] for k in flat if k.startswith(pref)})
    num_layers = n_convs - 2
    out: dict[str, np.ndarray] = {}
    for j, i in enumerate(_patchgan_torch_indices(num_layers)):
        if sn:
            _get_sn(flat, f"SNConv_{j}", out, f"model.{i}")
        else:
            out[f"model.{i}.weight"] = _ik(flat[f"Conv_{j}.kernel"])
            if f"Conv_{j}.bias" in flat:
                out[f"model.{i}.bias"] = flat[f"Conv_{j}.bias"]
    return out


EXT_CONVERTERS.update({
    "unet": convert_unet,
    "patchgan": convert_patchgan,
})
EXT_EXPORTERS.update({
    "unet": export_unet,
    "patchgan": export_patchgan,
})


# ---------------------------------------------------------------- ea2fpn
# The reference's DEFAULT net_d (ea2fpn_arch.py:214-309): ResNet18 encoder
# (registered twice in the torch state_dict — as `base_model.*` and through
# the aliased `layer_down*` Sequentials), SN pyramid/segmentation convs,
# DySample upsamplers, linear-attention aggregation.  The torch
# Conv3x3GNMish constructs an (unused) DySample even when upsample=False
# (ea2fpn_arch.py:158-164); import ignores it, export synthesizes it so
# strict loads succeed.


def _seg_upsamples(seg: str) -> int:
    return {"s5": 3, "s4": 2, "s3": 1, "s2": 0}[seg]


def convert_ea2fpn(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Reference ea2fpn .pth -> our flax params (+ batch_stats for BN
    running statistics and SN power-iteration u/v)."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    # trunk: read the torchvision-layout copy under base_model.*
    trunk_sd = {
        k[len("base_model."):]: v for k, v in sd.items()
        if k.startswith("base_model.") and not k.startswith("base_model.fc")
    }
    for k, v in convert_resnet18_trunk(trunk_sd).items():
        if k.startswith("batch_stats::"):
            out["batch_stats::ResNet18Trunk_0." + k[len("batch_stats::"):]] = v
        else:
            out[f"ResNet18Trunk_0.{k}"] = v
    _put_sn(out, "SNConv_0", sd, "conv1")
    # FPN blocks p4/p3/p2: DySample_0..2 + skip Conv_0..2
    for i, p in enumerate(("p4", "p3", "p2")):
        _dysample(out, f"DySample_{i}", sd, f"{p}.dysample", used)
        out[f"Conv_{i}.kernel"] = _k(sd[f"{p}.skip_conv.weight"])
        out[f"Conv_{i}.bias"] = sd[f"{p}.skip_conv.bias"]
    # segmentation heads: Conv3x3GNMish_0..6 in s5,s4,s3,s2 order
    gn = 0
    for seg in ("s5", "s4", "s3", "s2"):
        n_up = _seg_upsamples(seg)
        for b in range(max(n_up, 1)):
            tp, sc = f"{seg}.block.{b}", f"Conv3x3GNMish_{gn}"
            _put_sn(out, f"{sc}.SNConv_0", sd, f"{tp}.block.0")
            out[f"{sc}.GroupNorm_0.scale"] = sd[f"{tp}.block.1.weight"]
            out[f"{sc}.GroupNorm_0.bias"] = sd[f"{tp}.block.1.bias"]
            if n_up > 0:  # torch registers a dysample even when unused
                _dysample(out, f"{sc}.DySample_0", sd, f"{tp}.dysample", used)
            gn += 1
    # attention aggregation: SN convblk + BN + linear attention
    _put_sn(out, "SNConv_1", sd, "attention.convblk.conv")
    _put_bn(out, "BatchStatNorm_0", sd, "attention.convblk.bn", used)
    att = "attention.conv_atten"
    out["LinearAttention_0.gamma"] = sd[f"{att}.gamma"]
    for i, name in enumerate(("query_conv", "key_conv", "value_conv")):
        out[f"LinearAttention_0.Conv_{i}.kernel"] = _k(sd[f"{att}.{name}.weight"])
        out[f"LinearAttention_0.Conv_{i}.bias"] = sd[f"{att}.{name}.bias"]
    _put_sn(out, "SNConv_2", sd, "final_conv")
    _dysample(out, "DySample_3", sd, "dysample", used)
    return out


def export_resnet18_trunk(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_resnet18_trunk: ea2fpn.ResNet18Trunk params (+
    batch_stats:: running stats) -> torchvision-layout ResNet18 keys."""
    out: dict[str, np.ndarray] = {}
    _get_raw_conv(flat, "Conv_0", out, "conv1")
    _get_bn(flat, "BatchStatNorm_0", out, "bn1")
    for layer in range(1, 5):
        for tb, ob in ((1, 0), (0, 1)):
            tp = f"layer{layer}.{tb}"
            sc = f"BasicBlock_{2 * (layer - 1) + ob}"
            _get_raw_conv(flat, f"{sc}.Conv_0", out, f"{tp}.conv1")
            _get_bn(flat, f"{sc}.BatchStatNorm_0", out, f"{tp}.bn1")
            _get_raw_conv(flat, f"{sc}.Conv_1", out, f"{tp}.conv2")
            _get_bn(flat, f"{sc}.BatchStatNorm_1", out, f"{tp}.bn2")
            if f"{sc}.Conv_2.kernel" in flat:
                _get_raw_conv(flat, f"{sc}.Conv_2", out, f"{tp}.downsample.0")
                _get_bn(flat, f"{sc}.BatchStatNorm_2", out, f"{tp}.downsample.1")
    return out


def _synth_dysample_torch(out: dict, tp: str, in_ch: int = 64, scale: int = 2,
                          groups: int = 4, end_conv: bool = True) -> None:
    """Emit init-shaped buffers for a torch DySample that exists in the
    module tree but is never called (Conv3x3GNMish upsample=False)."""
    oc = 2 * groups * scale**2
    out[f"{tp}.offset.weight"] = np.zeros((oc, in_ch, 1, 1), np.float32)
    out[f"{tp}.offset.bias"] = np.zeros((oc,), np.float32)
    out[f"{tp}.scope.weight"] = np.zeros((oc, in_ch, 1, 1), np.float32)
    if end_conv:
        out[f"{tp}.end_conv.weight"] = np.zeros((in_ch, in_ch, 1, 1), np.float32)
        out[f"{tp}.end_conv.bias"] = np.zeros((in_ch,), np.float32)
    h = (np.arange(scale, dtype=np.float32) - (scale - 1) / 2) / scale
    gy, gx = np.meshgrid(h, h, indexing="ij")
    init = np.stack([gx, gy], axis=-1)
    init = np.tile(init[None, :, :, None, :], (1, 1, 1, groups, 1))
    out[f"{tp}.init_pos"] = (
        init.transpose(0, 4, 3, 1, 2).reshape(1, -1, 1, 1).astype(np.float32)
    )


def export_ea2fpn(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of convert_ea2fpn; emits BOTH registered copies of the trunk
    (base_model.* and the aliased layer_down* paths) plus the unused
    base_model.fc head so reference strict loads succeed."""
    out: dict[str, np.ndarray] = {}
    trunk_flat = {
        k[len("ResNet18Trunk_0."):]: v for k, v in flat.items()
        if k.startswith("ResNet18Trunk_0.")
    }
    trunk_flat.update({
        "batch_stats::" + k[len("batch_stats::ResNet18Trunk_0."):]: v
        for k, v in flat.items()
        if k.startswith("batch_stats::ResNet18Trunk_0.")
    })
    trunk = export_resnet18_trunk(trunk_flat)
    for k, v in trunk.items():
        out[f"base_model.{k}"] = v
        if k.startswith("conv1."):
            out["layer_down0.0." + k[len("conv1."):]] = v
        elif k.startswith("bn1."):
            out["layer_down0.1." + k[len("bn1."):]] = v
        elif k.startswith("layer1."):
            out["layer_down1.1." + k[len("layer1."):]] = v
        else:
            layer = int(k[5])  # layer2/3/4
            out[f"layer_down{layer}." + k[len("layerN."):]] = v
    out["base_model.fc.weight"] = np.zeros((1000, 512), np.float32)
    out["base_model.fc.bias"] = np.zeros((1000,), np.float32)
    _get_sn(flat, "SNConv_0", out, "conv1")
    for i, p in enumerate(("p4", "p3", "p2")):
        _get_dysample(flat, f"DySample_{i}", out, f"{p}.dysample",
                      scale=2, groups=4)
        from neosr_tpu.utils.torch_interop import _ik
        out[f"{p}.skip_conv.weight"] = _ik(flat[f"Conv_{i}.kernel"])
        out[f"{p}.skip_conv.bias"] = flat[f"Conv_{i}.bias"]
    gn = 0
    for seg in ("s5", "s4", "s3", "s2"):
        n_up = _seg_upsamples(seg)
        for b in range(max(n_up, 1)):
            tp, sc = f"{seg}.block.{b}", f"Conv3x3GNMish_{gn}"
            _get_sn(flat, f"{sc}.SNConv_0", out, f"{tp}.block.0")
            out[f"{tp}.block.1.weight"] = flat[f"{sc}.GroupNorm_0.scale"]
            out[f"{tp}.block.1.bias"] = flat[f"{sc}.GroupNorm_0.bias"]
            if n_up > 0:
                _get_dysample(flat, f"{sc}.DySample_0", out, f"{tp}.dysample",
                              scale=2, groups=4)
            else:
                _synth_dysample_torch(out, f"{tp}.dysample")
            gn += 1
    _get_sn(flat, "SNConv_1", out, "attention.convblk.conv")
    _get_bn(flat, "BatchStatNorm_0", out, "attention.convblk.bn")
    att = "attention.conv_atten"
    out[f"{att}.gamma"] = flat["LinearAttention_0.gamma"]
    from neosr_tpu.utils.torch_interop import _ik
    for i, name in enumerate(("query_conv", "key_conv", "value_conv")):
        out[f"{att}.{name}.weight"] = _ik(flat[f"LinearAttention_0.Conv_{i}.kernel"])
        out[f"{att}.{name}.bias"] = flat[f"LinearAttention_0.Conv_{i}.bias"]
    _get_sn(flat, "SNConv_2", out, "final_conv")
    _get_dysample(flat, "DySample_3", out, "dysample", scale=4, groups=3)
    return out


EXT_CONVERTERS["ea2fpn"] = convert_ea2fpn
EXT_EXPORTERS["ea2fpn"] = export_ea2fpn
