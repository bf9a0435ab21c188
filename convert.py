"""Model conversion / export entry point.

Same user contract as /root/reference/convert.py:17-226 (`--input ckpt
-net arch [-s scale] [--onnx|--safetensor] [-static C H W] [--fp16]
[-nocheck]`), TPU-native backends:

* safetensors export (flat param dict; ecosystem interop),
* StableHLO export via jax.export — the deployment artifact for XLA
  runtimes (PJRT plugins, IREE, serving stacks); static or dynamic batch,
* ONNX export is gated: emitted via jax2onnx when installed, otherwise a
  clear message (the package is not in this image).

Numeric parity check mirrors the reference's assert_verify (convert.py:65-86):
the exported function's output must match the live forward within
rtol=0.01 / atol=0.001 on random input.
"""

from __future__ import annotations

import sys
from os import path as osp
from pathlib import Path

import numpy as np


def load_network(args):
    import jax
    import jax.numpy as jnp

    from neosr_tpu.archs import build_network
    from neosr_tpu.utils.checkpoint import load_pytree, load_safetensors

    # --fp16 produces derived half-precision ARTIFACTS (reference
    # convert.py:168-181); the live network and all parity checks stay fp32
    dtype = jnp.float32
    net_opt = {"type": args.network}
    if args.opt:  # optional TOML carrying the exact network hyperparams
        from neosr_tpu.utils.options import toml_load

        cfg = toml_load(args.opt)
        # [network_g] for generators (untyped sections keep matching, as
        # before), [network_d] for discriminator nets (explicit type only)
        net_g, net_d = cfg.get("network_g", {}), cfg.get("network_d", {})
        if net_g and net_g.get("type", args.network) == args.network:
            net_opt.update(net_g)
            net_opt["type"] = args.network
        elif net_d.get("type") == args.network:
            net_opt.update(net_d)
            net_opt["type"] = args.network
    if args.window:  # archs like omnisr need the window explicitly
        net_opt.setdefault("window_size", args.window)
    net = build_network(net_opt, scale=args.scale, dtype=dtype)

    bstats = None
    if args.input.endswith(".safetensors"):
        loaded = load_safetensors(args.input)
    elif args.input.endswith((".pth", ".pt")):
        # reference-ecosystem torch checkpoint: convert the key layout
        from neosr_tpu.utils.torch_interop import load_torch_checkpoint

        loaded, bstats = load_torch_checkpoint(
            args.input, args.network, with_stats=True
        )
    else:
        loaded = load_pytree(args.input)
    if isinstance(loaded, dict) and "batch_stats" in loaded:
        bstats = loaded["batch_stats"]
    for key in ("params-ema", "params_ema", "params"):
        if isinstance(loaded, dict) and key in loaded:
            loaded = loaded[key]
            break

    # template init to obtain the structure, then graft loaded leaves
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    tmpl_vars = jax.jit(net.init)(jax.random.key(0), x)
    template = tmpl_vars["params"]
    params = jax.tree.map(
        lambda t, l: jnp.asarray(l).astype(t.dtype).reshape(t.shape), template, loaded
    )
    if bstats is not None and "batch_stats" in tmpl_vars:
        bstats = jax.tree.map(
            lambda t, l: jnp.asarray(l).astype(t.dtype).reshape(t.shape),
            dict(tmpl_vars["batch_stats"]), bstats,
        )
    elif "batch_stats" in tmpl_vars:
        bstats = dict(tmpl_vars["batch_stats"])  # init stats (0 mean / 1 var)
    else:
        bstats = None
    return net, params, bstats


def assert_verify(fn, ref_fn, shape, rtol=0.01, atol=0.001):
    rng = np.random.default_rng(0)
    x = rng.random(shape, dtype=np.float32)
    got = np.asarray(fn(x)).astype(np.float32)
    want = np.asarray(ref_fn(x)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)


def _mirror_opt(net) -> dict:
    """Hyperparameters of a flax net (a linen dataclass) as a plain dict,
    for building the torch ONNX mirror with matching dimensions."""
    import dataclasses

    return {
        f.name: getattr(net, f.name)
        for f in dataclasses.fields(net)
        if f.name not in ("parent", "name", "dtype")
    }


def to_exports(args) -> None:
    import jax
    import jax.numpy as jnp

    from neosr_tpu.utils.checkpoint import export_safetensors
    from neosr_tpu.utils.logger import get_root_logger

    logger = get_root_logger()
    # export + parity verification want true fp32 numerics; on TPU the
    # default conv/matmul precision is bf16 passes, which fails the
    # reference's rtol .01/atol .001 gate near zero
    jax.config.update("jax_default_matmul_precision", "highest")
    net, params, bstats = load_network(args)
    variables = {"params": params}
    if bstats:
        variables["batch_stats"] = bstats
    out_dir = Path(args.output if args.output else ".")
    out_dir.mkdir(parents=True, exist_ok=True)
    stem = Path(args.input).stem

    if args.static is not None:
        c, h, w = args.static
        shape = (1, h, w, c)
    else:
        shape = (1, 256, 256, 3)

    def forward(x):
        return net.apply(variables, x)

    jit_forward = jax.jit(forward)

    if args.safetensor:
        st_path = out_dir / f"{stem}.safetensors"
        export_safetensors(st_path, params, {
            "framework": "neosr_tpu", "arch": args.network, "scale": str(args.scale),
        })
        logger.info(f"safetensors written: {st_path}")

    if args.pth:
        from neosr_tpu.utils.torch_interop import save_torch_checkpoint

        pth_path = out_dir / f"{stem}.pth"
        save_torch_checkpoint(pth_path, params, args.network,
                              batch_stats=bstats)
        logger.info(f"torch-layout checkpoint written: {pth_path}")

    # StableHLO export (always; the TPU-native deployment format)
    try:
        from jax import export as jax_export

        exported = jax_export.export(jit_forward)(
            jax.ShapeDtypeStruct(shape, jnp.float32)
        )
        hlo_path = out_dir / f"{stem}.stablehlo"
        hlo_path.write_bytes(exported.serialize())
        logger.info(f"StableHLO written: {hlo_path} (input {shape})")

        if not args.nocheck:
            reloaded = jax_export.deserialize(hlo_path.read_bytes())
            assert_verify(lambda x: reloaded.call(x), jit_forward, shape)
            logger.info("StableHLO parity check passed (rtol=0.01, atol=0.001)")
    except Exception as e:
        logger.warning(f"StableHLO export failed: {e}")

    if args.onnx:
        # Primary path: torch mirror modules (utils/torch_mirror.py) carry
        # the flax weights through the reference checkpoint layout into
        # torch.onnx.export — same artifact the reference produces
        # (/root/reference/convert.py:89-182).  jax2onnx, when installed,
        # covers archs without a mirror.
        onnx_path = out_dir / f"{stem}.onnx"
        try:
            from neosr_tpu.utils.torch_mirror import (
                build_torch_mirror,
                export_onnx,
            )

            mirror = build_torch_mirror(
                args.network, _mirror_opt(net), args.scale, params,
                batch_stats=bstats,
            )
            export_onnx(mirror, onnx_path, shape_hw=shape[1:3],
                        channels=shape[3], dynamic=args.static is None)
            logger.info(f"ONNX written: {onnx_path} (opset 17, "
                        f"{'static' if args.static is not None else 'dynamic'} axes)")
            if not args.nocheck:
                import torch

                def torch_fwd(x):
                    with torch.inference_mode():
                        t = torch.from_numpy(
                            np.transpose(x, (0, 3, 1, 2)).copy())
                        y = mirror(t).numpy()
                    return np.transpose(y, (0, 2, 3, 1))

                assert_verify(torch_fwd, jit_forward, shape)
                logger.info("ONNX-graph parity check passed "
                            "(torch mirror vs flax, rtol=0.01, atol=0.001)")
            if args.fp16:
                # reference convert.py:168-181 writes a *_fp16.onnx next to
                # the fp32 one (checker-validated, not numerically gated)
                fp16_path = out_dir / f"{stem}_fp16.onnx"
                export_onnx(mirror.half(), fp16_path, shape_hw=shape[1:3],
                            channels=shape[3], dynamic=args.static is None,
                            fp16=True)
                mirror.float()
                logger.info(f"fp16 ONNX written: {fp16_path}")
        except ValueError as e:
            logger.warning(f"{e}")
            try:
                import jax2onnx

                logger.info("jax2onnx detected; exporting ONNX...")
                model = jax2onnx.to_onnx(
                    jit_forward, [jax.ShapeDtypeStruct(shape, jnp.float32)])
                onnx_path.write_bytes(model.SerializeToString())
                logger.info(f"ONNX written: {onnx_path}")
            except ImportError:
                logger.warning(
                    "No ONNX path for this arch: no torch mirror and the "
                    "'jax2onnx'/'onnx' packages are not installed. The "
                    ".safetensors export carries the weights for external "
                    "converters."
                )


if __name__ == "__main__":
    import jax

    # conversion runs on the host CPU backend, like the reference's
    # CPU-pinned torch.onnx.export (/root/reference/convert.py:126): exact
    # fp32 numerics for the parity gate, and no dependency on (or
    # contention for) an attached accelerator.
    jax.config.update("jax_platforms", "cpu")

    from neosr_tpu.utils.options import parse_options

    root_path = osp.abspath(osp.join(__file__, osp.pardir))
    _opt, args = parse_options(root_path, is_train=False)
    if args.input is None or args.network is None:
        print("convert.py requires --input <checkpoint> and -net <arch>.")
        sys.exit(1)
    if not args.safetensor and not args.onnx and not args.pth:
        args.safetensor = True  # default export
    to_exports(args)
