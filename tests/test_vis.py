"""Visualization tool: PNG figure rendering (reference vis.ipynb cells
4-31) and its matplotlib-free fallback."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import vis


def _synthetic(n=400, seed=0):
    rng = np.random.default_rng(seed)
    attn = rng.dirichlet(np.ones(n) * 0.1)
    emb_b = rng.normal(size=(n, 2))
    labels = (rng.uniform(size=n) < 0.3).astype(np.int64)
    emb_a = emb_b + labels[:, None] * 3.0   # re-embedding separates classes
    idx = np.arange(n)
    return attn, emb_b, emb_a, idx, labels


def test_render_figures_writes_pngs(tmp_path):
    pytest.importorskip("matplotlib")
    attn, emb_b, emb_a, idx, labels = _synthetic()
    ok = vis.render_figures(str(tmp_path), attn, emb_b, emb_a, idx, labels)
    assert ok
    for name in ("feature_maps.png", "attention_scatter.png"):
        p = tmp_path / name
        assert p.exists() and p.stat().st_size > 5000, name


def test_render_figures_unlabeled(tmp_path):
    pytest.importorskip("matplotlib")
    attn, emb_b, emb_a, idx, _ = _synthetic()
    assert vis.render_figures(str(tmp_path), attn, emb_b, emb_a, idx, None)
    assert (tmp_path / "feature_maps.png").exists()


def test_render_figures_no_matplotlib(tmp_path, monkeypatch, capsys):
    """Without matplotlib the tool must degrade to npz-only with a note,
    not crash (VERDICT r3 next #6)."""
    for mod in [m for m in sys.modules if m.startswith("matplotlib")]:
        monkeypatch.delitem(sys.modules, mod, raising=False)
    monkeypatch.setitem(sys.modules, "matplotlib", None)
    attn, emb_b, emb_a, idx, labels = _synthetic()
    ok = vis.render_figures(str(tmp_path), attn, emb_b, emb_a, idx, labels)
    assert not ok
    assert "matplotlib unavailable" in capsys.readouterr().out
    assert not list(tmp_path.glob("*.png"))


def test_point_in_polygon_square():
    square = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    pts = np.array([[5.0, 5.0], [15.0, 5.0], [-1.0, 2.0], [9.9, 9.9]])
    got = vis.point_in_polygon(pts, square)
    assert got.tolist() == [True, False, False, True]
