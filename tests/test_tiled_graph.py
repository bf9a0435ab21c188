"""In-graph scan-tiled inference: parity with the whole-image forward.

The graph path pads an edge-replicate halo of `overlap` around the LQ; with
overlap >= the net's receptive-field radius, tiled == whole EXACTLY except
within one receptive field of the image border (deep-net zero-input features
are nonzero — bias + activation — so NO input-space halo can reproduce the
whole forward's SAME feature padding at the border; every tiling scheme,
including the reference's per-tile loop, deviates there).
"""

import numpy as np
import pytest


def _build(tmp_path, tile_opts=None, num_feat=12, num_conv=2):
    from neosr_tpu.models import build_model
    from neosr_tpu.utils.options import opt_from_dict

    opt = {
        "name": "tiled_graph",
        "model_type": "image",
        "scale": 4,
        "num_gpu": 1,
        "manual_seed": 3,
        "is_train": False,
        "datasets": {},
        "network_g": {"type": "compact", "num_feat": num_feat, "num_conv": num_conv},
        "path": {},
        "val": {"tile": -1, **(tile_opts or {})},
    }
    opt = opt_from_dict(opt, root_path=str(tmp_path), is_train=False)
    return build_model(opt)


def _infer(model, img):
    import jax

    model.feed_data({"lq": img})
    model.test()
    return np.asarray(jax.device_get(model.output))


def test_graph_tiled_equals_whole_image(tmp_path):
    """128x128 (a pad-multiple: the whole path adds no padding), tile 64,
    overlap 16 >> compact's receptive field (~4 px) -> EXACT equality on
    everything but a receptive-field-wide border band, with no seam
    artifacts anywhere (all internal tile boundaries are interior)."""
    model = _build(tmp_path)
    rng = np.random.default_rng(0)
    img = rng.random((1, 128, 128, 3)).astype(np.float32)

    whole = _infer(model, img)
    model.opt["val"].update({"tile": 64, "tile_mode": "graph"})
    tiled = _infer(model, img)

    assert tiled.shape == whole.shape == (1, 512, 512, 3)
    m = 6 * 4  # receptive-field radius x scale, in output pixels
    np.testing.assert_allclose(
        tiled[:, m:-m, m:-m], whole[:, m:-m, m:-m], rtol=1e-5, atol=1e-5
    )
    # the border band is an edge-replicate approximation: bounded, finite
    assert np.isfinite(tiled).all()
    assert np.abs(tiled - whole).max() < 1.0


def test_graph_tiled_non_divisible_and_batch(tmp_path):
    """Non-divisible size and batch > 1: shapes correct; interior (>= one
    tile-overlap away from the border, where the whole path's bucket
    reflect-padding differs from the edge-replicate halo) still matches."""
    model = _build(tmp_path)
    rng = np.random.default_rng(1)
    img = rng.random((2, 100, 88, 3)).astype(np.float32)

    whole = _infer(model, img)
    model.opt["val"].update({"tile": 48, "tile_mode": "graph"})
    tiled = _infer(model, img)

    assert tiled.shape == whole.shape == (2, 400, 352, 3)
    m = 16 * 4
    np.testing.assert_allclose(
        tiled[:, m:-m, m:-m], whole[:, m:-m, m:-m], rtol=1e-5, atol=1e-5
    )
    assert np.isfinite(tiled).all()


def test_tile_mode_auto_and_host_dispatch(tmp_path, monkeypatch):
    """auto picks the graph path for small canvases and the host path when
    the canvas exceeds the budget; host/graph agree on the interior."""
    model = _build(tmp_path)
    rng = np.random.default_rng(2)
    img = rng.random((1, 96, 96, 3)).astype(np.float32)

    calls = {}
    orig_graph = model._tiled_forward_graph
    orig_host = model._tiled_forward

    def spy_graph(*a, **k):
        calls["graph"] = calls.get("graph", 0) + 1
        return orig_graph(*a, **k)

    def spy_host(*a, **k):
        calls["host"] = calls.get("host", 0) + 1
        return orig_host(*a, **k)

    monkeypatch.setattr(model, "_tiled_forward_graph", spy_graph)
    monkeypatch.setattr(model, "_tiled_forward", spy_host)

    model.opt["val"].update({"tile": 64, "tile_mode": "auto"})
    g = _infer(model, img)
    assert calls == {"graph": 1}

    # shrink the budget so auto falls back to the host-chunked path
    model.opt["val"]["tile_graph_budget_mb"] = 0.001
    h = _infer(model, img)
    assert calls == {"graph": 1, "host": 1}

    m = 16 * 4
    np.testing.assert_allclose(
        g[:, m:-m, m:-m], h[:, m:-m, m:-m], rtol=1e-4, atol=1e-4
    )

    model.opt["val"]["tile_mode"] = "bogus"
    with pytest.raises(ValueError):
        _infer(model, img)


def test_graph_tiled_uint8_input(tmp_path):
    """uint8 val batches normalize in-graph on the tiled path too."""
    model = _build(tmp_path)
    rng = np.random.default_rng(4)
    img8 = rng.integers(0, 256, (1, 64, 64, 3), dtype=np.uint8)

    whole = _infer(model, img8)
    model.opt["val"].update({"tile": 48, "tile_mode": "graph"})
    tiled = _infer(model, img8)
    m = 6 * 4
    np.testing.assert_allclose(
        tiled[:, m:-m, m:-m], whole[:, m:-m, m:-m], rtol=1e-5, atol=1e-5
    )


def test_graph_tiled_window_arch(tmp_path):
    """Window-attention arch through the scan-tiled path: tile must be a
    window multiple (clear config error otherwise), and interior parity
    with the whole-image forward holds like for conv nets."""
    from neosr_tpu.models import build_model
    from neosr_tpu.utils.options import opt_from_dict

    opt = {
        "name": "tiled_graph_swin",
        "model_type": "image",
        "scale": 4,
        "num_gpu": 1,
        "manual_seed": 3,
        "is_train": False,
        "datasets": {},
        "network_g": {"type": "swinir", "embed_dim": 12, "depths": [1],
                      "num_heads": [2], "window_size": 8,
                      "upsampler": "pixelshuffledirect"},
        "path": {},
        "val": {"tile": 32, "tile_mode": "graph", "tile_overlap": 8},
    }
    opt = opt_from_dict(opt, root_path=str(tmp_path), is_train=False)
    model = build_model(opt)
    rng = np.random.default_rng(5)
    img = rng.random((1, 64, 64, 3)).astype(np.float32)

    model.opt["val"]["tile"] = -1
    whole = _infer(model, img)
    model.opt["val"]["tile"] = 32
    tiled = _infer(model, img)
    assert tiled.shape == whole.shape == (1, 256, 256, 3)
    # window attention mixes within an 8px window: stay 2 windows + overlap
    # clear of the border for the interior comparison.  Tolerance is fp
    # reassociation between the two differently-fused XLA programs (softmax
    # + prelu chains), observed max ~2.5e-4.
    m = 24 * 4
    np.testing.assert_allclose(
        tiled[:, m:-m, m:-m], whole[:, m:-m, m:-m], rtol=1e-3, atol=5e-4
    )

    model.opt["val"]["tile"] = 30  # not a window multiple
    with pytest.raises(ValueError, match="window_size"):
        _infer(model, img)
