"""Packaged-config reachability: every YAML under vwfd_tpu/configs/ must
load into a valid typed Config (unknown keys raise — options/options.py
NoneDict replacement), and the flagship video.yaml must stay in sync with
the bench defaults so the judged headline and the CLI train the same nets."""

import glob
import os

import pytest

from vwfd_tpu.config import load_config

_CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "vwfd_tpu", "configs")
_YAMLS = sorted(glob.glob(os.path.join(_CFG_DIR, "*.yaml")))


@pytest.mark.parametrize("path", _YAMLS, ids=[os.path.basename(p) for p in _YAMLS])
def test_packaged_yaml_loads(path):
    cfg = load_config(path)
    assert cfg.data.gt_size > 0
    assert cfg.train.lr > 0


def test_video_yaml_matches_bench_flagship():
    cfg = load_config(os.path.join(_CFG_DIR, "video.yaml"))
    assert cfg.model.inn_subnet == "res_tpu2"
    assert cfg.model.extractor == "unet_tpu"
    # bench.py argparse defaults define the judged headline configuration —
    # keep them pinned to the yaml so the CLI trains what the bench measures
    src = open(os.path.join(_CFG_DIR, "..", "..", "bench.py")).read()
    assert 'default="%s"' % cfg.model.inn_subnet in src
    assert 'default="%s"' % cfg.model.extractor in src
    # the packed-space executor is the flagship default in both places
    assert cfg.model.inn_packed is True
    assert "--packed" in src and "default=True" in src
    # per-level encoder-conv plan (BASELINE.md r3): yaml and bench agree
    assert tuple(cfg.model.extractor_enc_convs) == (2, 2, 1, 1, 1)
    assert 'default="2,2,1,1,1"' in src
