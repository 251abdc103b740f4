"""Round-trip tests for the standalone CLI scripts (SURVEY §2.8)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

_SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_SCRIPTS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_generate_immunized_roundtrip(tmp_path, rng, monkeypatch):
    """only_gen_immunized export (IRNp_model.py:461-491): folder in →
    immunized folder out, same count, valid [0,1] PNGs, content changed."""
    ori = tmp_path / "ori"
    out = tmp_path / "immu"
    ori.mkdir()
    for i in range(3):
        img = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(ori / f"im{i}.png"), img)

    mod = _load("generate_immunized")
    monkeypatch.setattr(sys, "argv", [
        "generate_immunized.py", "--ori", str(ori), "--out", str(out),
        "--size", "32", "--batch", "2"])
    mod.main()

    names = sorted(os.listdir(out))
    assert names == ["im0.png", "im1.png", "im2.png"]
    for i, n in enumerate(names):
        im = cv2.imread(str(out / n), cv2.IMREAD_COLOR)
        assert im is not None and im.shape == (32, 32, 3)
        # the zero-init coupling heads make the INN near-identity at init, so
        # the immunized export must stay CLOSE to the source (not necessarily
        # byte-different) — imperceptibility by construction
        src = cv2.resize(cv2.imread(str(ori / f"im{i}.png")), (32, 32))
        assert np.abs(im.astype(np.float32) -
                      src.astype(np.float32)).mean() < 16.0
