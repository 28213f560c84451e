"""Geometry utils vs the reference implementations (imported from the
read-only tree where possible) and torch numerics."""

import importlib.util
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from uni_encoder_tpu import geometry as G

REF = "/root/reference/model/modeling/monodepth_loss.py"


@pytest.fixture(scope="module")
def ref():
    torch = pytest.importorskip("torch")
    pytest.importorskip("cv2")
    # stub the reference's soft deps
    for name, attrs in [
        ("model", {}),
        ("model.utils", {}),
        ("model.utils.misc", {"is_dist_avail_and_initialized": lambda: False}),
    ]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    spec = importlib.util.spec_from_file_location("ref_monodepth", REF)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as e:  # matplotlib/PIL etc. missing
        pytest.skip(f"cannot import reference monodepth module: {e}")
    return mod


def test_disp_to_depth(ref):
    import torch

    disp = np.random.RandomState(0).rand(2, 1, 4, 4).astype(np.float32)
    sd_ref, d_ref = ref.disp_to_depth(torch.from_numpy(disp))
    sd, d = G.disp_to_depth(jnp.asarray(disp))
    np.testing.assert_allclose(np.asarray(sd), sd_ref.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d), d_ref.numpy(), rtol=1e-5)


def test_transformation_from_parameters(ref):
    import torch

    rng = np.random.RandomState(1)
    aa = rng.randn(3, 1, 3).astype(np.float32) * 0.1
    t = rng.randn(3, 1, 3).astype(np.float32) * 0.5
    for invert in (False, True):
        T_ref = ref.transformation_from_parameters(
            torch.from_numpy(aa), torch.from_numpy(t), invert=invert
        ).numpy()
        T = np.asarray(G.transformation_from_parameters(jnp.asarray(aa), jnp.asarray(t), invert))
        np.testing.assert_allclose(T, T_ref, atol=1e-5)


def test_backproject_project_roundtrip(ref):
    import torch

    B, H, W = 2, 8, 12
    rng = np.random.RandomState(2)
    depth = rng.rand(B, H, W).astype(np.float32) * 10 + 1
    K = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    K[:, 0, 0] = K[:, 1, 1] = 20.0
    K[:, 0, 2], K[:, 1, 2] = W / 2, H / 2
    inv_K = np.linalg.inv(K)

    bp = ref.BackprojectDepth(B, H, W)
    pj = ref.Project3D(B, H, W)
    cam_ref = bp(torch.from_numpy(depth[:, None]), torch.from_numpy(inv_K))
    pix_ref, ego_ref = pj(cam_ref, torch.from_numpy(K), torch.from_numpy(np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()))

    cam = G.backproject_depth(jnp.asarray(depth), jnp.asarray(inv_K), H, W)
    np.testing.assert_allclose(np.asarray(cam), cam_ref.numpy(), atol=1e-4)
    pix, ego = G.project_3d(cam, jnp.asarray(K), jnp.asarray(np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()), H, W)
    np.testing.assert_allclose(np.asarray(pix), pix_ref.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ego), ego_ref.numpy(), atol=1e-4)


def test_ssim_matches_reference(ref):
    import torch

    rng = np.random.RandomState(3)
    x = rng.rand(1, 3, 10, 12).astype(np.float32)
    y = rng.rand(1, 3, 10, 12).astype(np.float32)
    s_ref = ref.SSIM()(torch.from_numpy(x), torch.from_numpy(y)).numpy()
    s = np.asarray(G.ssim(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(s.transpose(0, 3, 1, 2), s_ref, atol=1e-5)


def test_smooth_loss_matches_reference(ref):
    import torch

    rng = np.random.RandomState(4)
    inp = rng.rand(2, 1, 8, 8).astype(np.float32)
    img = rng.rand(2, 3, 8, 8).astype(np.float32)
    l_ref = ref.compute_smooth_loss(torch.from_numpy(inp), torch.from_numpy(img)).item()
    l = float(G.compute_smooth_loss(jnp.asarray(inp.transpose(0, 2, 3, 1)), jnp.asarray(img.transpose(0, 2, 3, 1))))
    assert abs(l - l_ref) < 1e-6
