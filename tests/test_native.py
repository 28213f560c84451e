"""Native C++ data-path kernels vs their numpy/torch references."""

import numpy as np
import pytest

from uni_encoder_tpu import native


def test_builds():
    assert native.get_lib() is not None, "g++ build of uniio.so failed"


def test_resize_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (37, 53, 3), np.uint8)
    out = native.resize_bilinear_u8(img, 64, 96)
    t = torch.from_numpy(img).permute(2, 0, 1)[None].float()
    ref = F.interpolate(t, size=(64, 96), mode="bilinear", align_corners=False)
    ref = ref[0].permute(1, 2, 0).round().clamp(0, 255).byte().numpy()
    # rounding at exact .5 may differ by 1
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_normalize_pad():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (10, 12, 3), np.uint8)
    mean = [123.675, 116.28, 103.53]
    std = [58.395, 57.12, 57.375]
    out = native.normalize_pad(img, mean, std, 16, 16)
    ref = np.zeros((16, 16, 3), np.float32)
    ref[:10, :12] = (img.astype(np.float32) - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_decode_panoptic_ids():
    rng = np.random.RandomState(2)
    rgb = rng.randint(0, 255, (7, 9, 3), np.uint8)
    out = native.decode_panoptic_ids(rgb)
    r = rgb.astype(np.int64)
    ref = r[..., 0] + 256 * r[..., 1] + 65536 * r[..., 2]
    np.testing.assert_array_equal(out, ref)


def test_accumulate_confusion():
    rng = np.random.RandomState(3)
    gt = rng.randint(0, 20, (100,), np.uint8)
    gt[::7] = 255
    pred = rng.randint(0, 19, (100,), np.uint8)
    mat = np.zeros((19, 19), np.int64)
    native.accumulate_confusion(gt, pred, 19, 255, mat)
    ref = np.zeros((19, 19), np.int64)
    valid = (gt != 255) & (gt < 19)
    for g, p in zip(gt[valid], pred[valid]):
        ref[g, p] += 1
    np.testing.assert_array_equal(mat, ref)
