"""Data pipeline tests: loaders, masks, JPEG/DCT datasets, native kernel."""

import numpy as np
import pytest

from vwfd_tpu.data import (
    SyntheticVideoDataset, SyntheticImageDataset, Loader, LQJpegDataset,
    DCTDomainDataset, blockwise_dct_np, free_form_stroke_mask,
    random_rect_mask,
)


def test_synthetic_video_contract():
    ds = SyntheticVideoDataset(size=64, frames=4, length=4, seed=0)
    video, mask = ds[0]
    assert video.shape == (4, 64, 64, 3)
    assert mask.shape == (4, 64, 64, 1)
    assert 0 <= video.min() and video.max() <= 1
    assert set(np.unique(mask)) <= {0.0, 1.0}
    assert 0 < mask.mean() < 0.5


def test_loader_batching_and_ratio():
    ds = SyntheticImageDataset(size=32, length=10, seed=0)
    loader = Loader(ds, batch_size=4, ratio=2)
    batches = list(loader)
    assert len(batches) == 5  # 10*2 // 4
    assert batches[0].shape == (4, 32, 32, 3)


def test_loader_tuple_items():
    ds = SyntheticVideoDataset(size=32, frames=2, length=4, seed=0)
    loader = Loader(ds, batch_size=2)
    video, mask = next(iter(loader))
    assert video.shape == (2, 2, 32, 32, 3)
    assert mask.shape == (2, 2, 32, 32, 1)


def test_stroke_mask_area(rng):
    m = free_form_stroke_mask(rng, (256, 256), percent_range=(0.2, 0.3))
    assert m.shape == (256, 256)
    assert m.mean() >= 0.2
    m2 = random_rect_mask(rng, (64, 64), 0.1, 0.2)
    assert 0 < m2.mean() <= 0.25


def test_lq_jpeg_dataset():
    ds = LQJpegDataset(size=64, qualities=(30, 70), synthetic_length=3)
    versions, labels = ds[0]
    assert versions.shape == (3, 64, 64, 3)  # clean + 2 QFs
    assert list(labels) == [0, 1, 2]
    # lower quality → larger deviation from clean
    d30 = np.abs(versions[1] - versions[0]).mean()
    d70 = np.abs(versions[2] - versions[0]).mean()
    assert d30 > d70 > 0


def test_dct_domain_dataset():
    ds = DCTDomainDataset(size=64, synthetic_length=2)
    item = ds[0]
    assert item["dct_y"].shape == (8, 8, 64)
    assert item["dct_cb"].shape == (4, 4, 64)
    assert np.isfinite(item["dct_y"]).all()


def test_native_dct_matches_numpy(rng):
    from vwfd_tpu import native
    p = rng.random((64, 64)).astype(np.float32)
    want = blockwise_dct_np_ref(p)
    got = blockwise_dct_np(p)  # uses native when available
    np.testing.assert_allclose(got, want, atol=1e-4)
    if native.available():
        np.testing.assert_allclose(native.blockwise_dct(p), want, atol=1e-4)


def blockwise_dct_np_ref(plane):
    c = np.zeros((8, 8))
    c[0, :] = np.sqrt(1 / 8)
    for i in range(1, 8):
        for j in range(8):
            c[i, j] = np.cos(np.pi * i * (2 * j + 1) / 16) * np.sqrt(2 / 8)
    h, w = plane.shape
    b = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    return np.einsum("ua,ijab,vb->ijuv", c, b, c).reshape(h // 8, w // 8, 64)


def test_native_line_raster():
    from vwfd_tpu import native
    if not native.available():
        pytest.skip("no compiler")
    m = np.zeros((64, 64), np.float32)
    native.draw_thick_line(m, 5, 5, 40, 40, 3)
    assert m.sum() > 100
    assert m.max() == 1.0


def test_image_io_augmentations(rng):
    """8-fold dihedral augs + crop-to-multiple (utils/image_io.py rebuilds)."""
    from vwfd_tpu.utils.images import (
        create_augmentations, create_video_augmentations, crop_to_multiple)
    img = rng.random((37, 45, 3)).astype("float32")
    augs = create_augmentations(img)
    assert len(augs) == 8
    assert {a.shape for a in augs} == {(37, 45, 3), (45, 37, 3)}
    np.testing.assert_allclose(augs[0], img)
    vid = rng.random((2, 16, 20, 3)).astype("float32")
    vaugs = create_video_augmentations(vid)
    assert len(vaugs) == 8 and vaugs[1].shape == (2, 20, 16, 3)
    c = crop_to_multiple(img, 32)
    assert c.shape == (32, 32, 3)


def test_davis_loader_on_committed_fixture():
    """Drive the DAVIS directory-layout loader over REAL committed image
    files (tests/fixtures/davis_mini: 48x48 JPEGs + PNG masks in the
    JPEGImages/Annotations 480p layout — VERDICT r2 'real-data' gap). The
    fixture contains one acceptable video, one whose mask rate exceeds the
    bound, and one with too few frames; both of the latter must land on the
    skip list (reference rejection semantics, data/Dataloader.py:77-95)."""
    import os

    from vwfd_tpu.data.davis import DavisVideoDataset

    root = os.path.join(os.path.dirname(__file__), "fixtures", "davis_mini")
    ds = DavisVideoDataset(root, size=32, frames=4, mask_rate_max=0.2, seed=3)
    assert len(ds) == 3
    for _ in range(4):
        video, mask = ds[0]
        assert video.shape == (4, 32, 32, 3) and video.dtype == np.float32
        assert mask.shape == (4, 32, 32, 1)
        assert 0.0 <= video.min() and video.max() <= 1.0
        rate = float(mask.mean())
        assert 0.0 < rate < 0.2, rate
        assert set(np.unique(mask)) <= {0.0, 1.0}
    assert ds.skip_list == {"flood-mini", "short-mini"}

    # and through the batching Loader (host pipeline end-to-end)
    from vwfd_tpu.data import Loader

    batch = next(iter(Loader(ds, batch_size=2, seed=0)))
    assert batch[0].shape == (2, 4, 32, 32, 3)
    assert batch[1].shape == (2, 4, 32, 32, 1)
