"""Every shipped options/*.toml template must parse and resolve its registries.

The reference ships one train / train_otf / test TOML per arch family
(reference options/, 79 files); this guards our equivalent set: schema parse,
experiment-dir layout, and that every `type = "..."` name the template uses
(network_g/network_d, losses, optimizers, metrics, datasets) resolves in the
corresponding registry — so a user can take any template and run it.
"""

from pathlib import Path

import pytest

from neosr_tpu.archs import ARCH_REGISTRY
from neosr_tpu.losses import LOSS_REGISTRY
from neosr_tpu.metrics import METRIC_REGISTRY
from neosr_tpu.utils.options import opt_from_dict, toml_load

OPTIONS_DIR = Path(__file__).resolve().parent.parent / "options"
TEMPLATES = sorted(OPTIONS_DIR.glob("*.toml"))


def _registry_names(reg):
    return set(reg.keys()) if hasattr(reg, "keys") else set(reg._obj_map)


@pytest.mark.parametrize("path", TEMPLATES, ids=lambda p: p.stem)
def test_template_parses_and_resolves(path, tmp_path):
    opt = toml_load(str(path))
    is_train = path.stem.startswith("train")
    opt_from_dict(opt, root_path=tmp_path, is_train=is_train)

    archs = _registry_names(ARCH_REGISTRY)
    assert opt["network_g"]["type"] in archs, opt["network_g"]["type"]
    if opt.get("network_d"):
        assert opt["network_d"]["type"] in archs

    losses = _registry_names(LOSS_REGISTRY)
    train = opt.get("train") or {}
    for key, block in train.items():
        if key.endswith("_opt") and key not in ("optim_g", "optim_d"):
            assert block["type"] in losses, f"{path.stem}: {block['type']}"

    metrics = _registry_names(METRIC_REGISTRY)
    val = opt.get("val") or {}
    for block in (val.get("metrics") or {}).values():
        assert block["type"] in metrics

    assert opt["scale"] == 4
    assert opt["model_type"] in ("image", "otf")
    if is_train:
        ds = opt["datasets"]["train"]
        assert ds["type"] in ("paired", "otf")
        if opt["model_type"] == "otf":
            # [degradations] is merged into the train dataset opt
            # (reference train.py:68-70 semantics).
            assert "kernel_list" in ds or "kernel_list" in opt.get("degradations", {})


def test_full_template_coverage():
    """One train + train_otf + test template per generator family."""
    stems = {p.stem for p in TEMPLATES}
    families = [
        "compact", "esrgan", "span", "spanplus", "plksr", "realplksr",
        "cugan", "ditn", "dctlsa", "man", "mosr", "msdan", "safmn",
        "omnisr", "craft", "swinir", "hat", "atd", "dat", "drct",
        "srformer", "hitsrf", "hma", "rgt", "grformer", "eimn",
    ]
    missing = [
        name
        for fam in families
        for name in (f"train_{fam}", f"train_{fam}_otf", f"test_{fam}")
        if name not in stems
    ]
    assert not missing, missing
