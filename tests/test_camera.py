import jax.numpy as jnp
import numpy as np

from ur_mvo_tpu.camera import Camera, make_pinhole, remap_bilinear


AQUA_YAML = "/root/reference/configs/camera_settings/aqua.yaml"


def test_project_backproject_roundtrip():
    cam = make_pinhole(640, 512, 413.3, 413.7, 305.9, 259.4)
    pc = jnp.array([[0.5, -0.2, 2.0], [0.0, 0.0, 1.0]])
    uv = cam.project(pc)
    rays = cam.back_project(uv)
    pc2 = rays * pc[:, 2:3]
    np.testing.assert_allclose(np.asarray(pc), np.asarray(pc2), atol=1e-4)


def test_stereo_roundtrip():
    cam = make_pinhole(640, 512, 400.0, 400.0, 320.0, 256.0, bf=48.0)
    pc = jnp.array([[0.3, 0.1, 3.0]])
    uvr = cam.stereo_project(pc)
    pc2 = cam.back_project_stereo(uvr[:, :2], uvr[:, 2])
    np.testing.assert_allclose(np.asarray(pc), np.asarray(pc2), atol=1e-4)


def test_in_image_bounds():
    cam = make_pinhole(640, 512, 400.0, 400.0, 320.0, 256.0)
    uv = jnp.array([[0.0, 0.0], [639.0, 511.0], [-1.0, 0.0], [640.0, 100.0]])
    np.testing.assert_array_equal(np.asarray(cam.in_image(uv)), [True, True, False, False])


def test_load_reference_calibration():
    cam = Camera.from_yaml(AQUA_YAML)
    assert cam.width == 640 and cam.height == 512
    np.testing.assert_allclose(cam.fx, 413.32595366566017)
    np.testing.assert_allclose(cam.cy, 259.4439948946375)
    np.testing.assert_allclose(cam.bf, 47.90639384423901)
    assert cam.undistort_map is not None
    assert cam.undistort_map.shape == (512, 640, 2)
    # The map must be finite and roughly centered: the source pixel for the
    # principal point should be near the principal point itself.
    assert np.all(np.isfinite(cam.undistort_map))
    cx_src, cy_src = cam.undistort_map[int(cam.cy), int(cam.cx)]
    assert abs(cx_src - cam.cx) < 15.0
    assert abs(cy_src - cam.cy) < 15.0


def test_remap_identity():
    H, W = 32, 48
    img = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    ident = jnp.asarray(np.stack([xx, yy], axis=-1))
    out = remap_bilinear(img, ident)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_remap_shift():
    H, W = 16, 16
    img = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    shifted = jnp.asarray(np.stack([xx + 0.5, yy], axis=-1))
    out = remap_bilinear(img, shifted)
    expected = 0.5 * (np.asarray(img)[:, :-1] + np.asarray(img)[:, 1:])
    np.testing.assert_allclose(np.asarray(out)[:, :-1], expected, atol=1e-4)
