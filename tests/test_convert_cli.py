"""convert.py end-to-end through the CLI surface (subprocess), mirroring the
reference's export workflow (/root/reference/convert.py:221-226): checkpoint
in -> safetensors + .pth + StableHLO + ONNX out, parity gates on."""

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_convert_cli_all_formats(tmp_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from neosr_tpu.archs import build_network
    from neosr_tpu.utils.checkpoint import export_safetensors

    net = build_network({"type": "compact", "num_feat": 12, "num_conv": 2},
                        scale=2, dtype=jnp.float32)
    params = net.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))["params"]
    ckpt = tmp_path / "c.safetensors"
    export_safetensors(ckpt, params, {"arch": "compact"})
    cfg = tmp_path / "c.toml"
    cfg.write_text(
        'name="x"\nmodel_type="image"\nscale=2\n'
        '[network_g]\ntype="compact"\nnum_feat=12\nnum_conv=2\n'
    )

    out = tmp_path / "out"
    res = subprocess.run(
        [sys.executable, str(ROOT / "convert.py"),
         "--input", str(ckpt), "-net", "compact", "-s", "2",
         "-opt", str(cfg), "--onnx", "--safetensor", "--pth", "--fp16",
         "-static", "3", "32", "32", "--output", str(out)],
        capture_output=True, text=True, timeout=900, cwd=str(ROOT),
    )
    log = res.stdout + res.stderr
    assert res.returncode == 0, log[-2000:]
    for suffix in (".safetensors", ".pth", ".stablehlo", ".onnx"):
        assert (out / f"c{suffix}").exists(), f"missing {suffix}: {log[-1500:]}"
    assert (out / "c_fp16.onnx").exists(), f"missing fp16 onnx: {log[-1500:]}"
    assert "ONNX-graph parity check passed" in log
    assert "StableHLO parity check passed" in log


def test_convert_cli_discriminator_pth(tmp_path):
    """convert.py exports net_d checkpoints too (unet -> reference-layout
    .pth with SN u/v from batch_stats + StableHLO, parity-gated)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from neosr_tpu.archs import build_network
    from neosr_tpu.utils.checkpoint import save_pytree

    net = build_network({"type": "unet", "num_feat": 16}, scale=4)
    v = net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    ckpt = tmp_path / "net_d.ckpt"
    save_pytree(ckpt, {"params": jax.device_get(v["params"]),
                       "batch_stats": jax.device_get(v["batch_stats"])})
    cfg = tmp_path / "d.toml"
    cfg.write_text('[network_d]\ntype="unet"\nnum_feat=16\n')
    out = tmp_path / "out"
    res = subprocess.run(
        [sys.executable, str(ROOT / "convert.py"),
         "--input", str(ckpt), "-net", "unet", "-s", "4", "--pth",
         "-opt", str(cfg), "--output", str(out)],
        capture_output=True, text=True, timeout=900, cwd=str(ROOT),
    )
    log = res.stdout + res.stderr
    assert res.returncode == 0, log[-2000:]
    assert (out / "net_d.pth").exists()
    import torch

    sd = torch.load(out / "net_d.pth", map_location="cpu", weights_only=True)
    sd = sd.get("params", sd)
    assert "conv1.weight_orig" in sd and "conv1.weight_u" in sd
