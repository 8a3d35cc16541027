import jax.numpy as jnp
import numpy as np

from ur_mvo_tpu.camera import (
    Camera,
    distort_radtan,
    make_pinhole,
    remap_bilinear,
    undistort_radtan,
)


AQUA_YAML = "/root/reference/configs/camera_settings/aqua.yaml"


def _write_stereo_yaml(path, W=160, H=120, fx=130.0, d_right=(-0.25, 0.08, 0.001, -0.0005),
                       with_right_r=True):
    """Distortion-free LEFT + radially-distorted RIGHT calibration, the
    layout camera.cc:46-59 requires for a stereo rig."""
    cx, cy = W / 2.0, H / 2.0
    k1, k2, p1, p2 = d_right
    with open(path, "w") as f:
        f.write(
            "%YAML:1.0\n---\n"
            f"image_width: {W}\nimage_height: {H}\n"
            "distortion_type: 0\n"
            f"bf: {fx * 0.1}\n"
            "LEFT_K: !!opencv-matrix\n   rows: 3\n   cols: 3\n   dt: d\n"
            f"   data: [{fx}, 0., {cx}, 0., {fx}, {cy}, 0., 0., 1.]\n"
            "LEFT_D: !!opencv-matrix\n   rows: 1\n   cols: 4\n   dt: d\n"
            "   data: [0., 0., 0., 0.]\n"
            "RIGHT_K: !!opencv-matrix\n   rows: 3\n   cols: 3\n   dt: d\n"
            f"   data: [{fx}, 0., {cx}, 0., {fx}, {cy}, 0., 0., 1.]\n"
            "RIGHT_D: !!opencv-matrix\n   rows: 1\n   cols: 4\n   dt: d\n"
            f"   data: [{k1}, {k2}, {p1}, {p2}]\n"
        )
        if with_right_r:
            f.write(
                "RIGHT_R: !!opencv-matrix\n   rows: 3\n   cols: 3\n   dt: d\n"
                "   data: [1., 0., 0., 0., 1., 0., 0., 0., 1.]\n"
            )
        f.write(
            "RIGHT_P: !!opencv-matrix\n   rows: 3\n   cols: 4\n   dt: d\n"
            f"   data: [{fx}, 0., {cx}, {-fx * 0.1}, 0., {fx}, {cy}, 0., 0., 0., 1., 0.]\n"
        )


def test_partial_right_block_warns(tmp_path):
    """A RIGHT_K/D block missing RIGHT_R must warn (the reference
    hard-exits on partial blocks, camera.cc:53-59); a complete block
    loads silently."""
    import warnings

    import pytest

    yaml_path = str(tmp_path / "stereo.yaml")
    _write_stereo_yaml(yaml_path, with_right_r=False)
    with pytest.warns(UserWarning, match="RIGHT_R"):
        cam = Camera.from_yaml(yaml_path)
    assert cam.undistort_map_right is not None
    _write_stereo_yaml(yaml_path, with_right_r=True)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        cam2 = Camera.from_yaml(yaml_path)
    np.testing.assert_allclose(cam2.undistort_map_right, cam.undistort_map_right)


def test_right_camera_rectify_map(tmp_path):
    """RIGHT_K/D/R/P must yield a SEPARATE rectify map (camera.cc:61-75);
    this test fails under round-1's shared-left-map behavior."""
    yaml_path = str(tmp_path / "stereo.yaml")
    d_right = np.array([-0.25, 0.08, 0.001, -0.0005])
    _write_stereo_yaml(yaml_path, d_right=tuple(d_right))
    cam = Camera.from_yaml(yaml_path)
    assert cam.undistort_map_right is not None
    # Left is distortion-free: its map is the identity grid.
    yy, xx = np.mgrid[0 : cam.height, 0 : cam.width].astype(np.float32)
    np.testing.assert_allclose(cam.undistort_map[..., 0], xx, atol=1e-3)
    np.testing.assert_allclose(cam.undistort_map[..., 1], yy, atol=1e-3)
    # Right map must match the analytic forward distortion of the
    # rectified ray, and differ from the left map away from center.
    u, v = 20.0, 15.0
    x = (u - cam.cx) / cam.fx
    y = (v - cam.cy) / cam.fy
    xyd = distort_radtan(np.array([[x, y]]), d_right)[0]
    np.testing.assert_allclose(
        cam.undistort_map_right[int(v), int(u)],
        [cam.fx * xyd[0] + cam.cx, cam.fx * xyd[1] + cam.cy],
        atol=1e-3,
    )
    delta = np.abs(cam.undistort_map_right - cam.undistort_map)
    assert delta.max() > 3.0  # shared-map behavior would give 0


def test_right_rectification_recovers_pinhole_view(tmp_path):
    """Render a scene through the distorted right lens, rectify with the
    right map -> matches the ideal pinhole render. Rectifying with the
    LEFT map (round-1 behavior) leaves multi-pixel warping error."""
    yaml_path = str(tmp_path / "stereo.yaml")
    d_right = np.array([-0.25, 0.08, 0.001, -0.0005])
    _write_stereo_yaml(yaml_path, d_right=tuple(d_right))
    cam = Camera.from_yaml(yaml_path)

    def scene(x, y):  # smooth texture at infinity, function of the ray
        return 0.5 + 0.25 * np.sin(9.0 * x) + 0.25 * np.cos(7.0 * y + 3.0 * x)

    yy, xx = np.mgrid[0 : cam.height, 0 : cam.width].astype(np.float64)
    xn = (xx - cam.cx) / cam.fx
    yn = (yy - cam.cy) / cam.fy
    ideal = scene(xn, yn)
    # Distorted right image: pixel (u,v) sees the ray whose distortion
    # lands on (u,v) -> iterative undistort.
    rays = undistort_radtan(np.stack([xn, yn], axis=-1), d_right)
    distorted = scene(rays[..., 0], rays[..., 1])

    rect_right = np.asarray(remap_bilinear(jnp.asarray(distorted), jnp.asarray(cam.undistort_map_right)))
    rect_left = np.asarray(remap_bilinear(jnp.asarray(distorted), jnp.asarray(cam.undistort_map)))
    # interior crop (borders lose pixels to the distortion pull-in)
    c = 12
    err_right = np.abs(rect_right - ideal)[c:-c, c:-c].max()
    err_left = np.abs(rect_left - ideal)[c:-c, c:-c].max()
    assert err_right < 0.02, err_right
    assert err_left > 0.1, err_left  # the bug this guards against


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


def test_subpixel_keypoint_refinement():
    """A Gaussian peak at a known sub-pixel location must be recovered to
    ~0.05 px by the quadratic fit (integer selection alone is ±0.5 px)."""
    from ur_mvo_tpu.ops.keypoints import select_keypoints

    H, W = 48, 64
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    px, py = 31.3, 22.6
    raw = np.exp(-((xx - px) ** 2 + (yy - py) ** 2) / (2 * 1.5**2)).astype(np.float32)
    # crude NMS stand-in: keep only the global max pixel
    nms = np.where(raw >= raw.max(), raw, 0.0).astype(np.float32)
    desc_map = np.zeros((H // 8, W // 8, 16), np.float32)
    bank = select_keypoints(
        jnp.asarray(nms), jnp.asarray(desc_map), capacity=8, threshold=0.1,
        border=2, max_keypoints=8, raw_scores=jnp.asarray(raw),
    )
    k = np.asarray(bank.kpts)[np.asarray(bank.valid)]
    assert len(k) == 1
    assert abs(k[0, 0] - px) < 0.05, k[0]
    assert abs(k[0, 1] - py) < 0.05, k[0]
    # without raw scores: integer position
    bank_i = select_keypoints(
        jnp.asarray(nms), jnp.asarray(desc_map), capacity=8, threshold=0.1,
        border=2, max_keypoints=8,
    )
    ki = np.asarray(bank_i.kpts)[np.asarray(bank_i.valid)]
    assert ki[0, 0] == round(ki[0, 0]) and ki[0, 1] == round(ki[0, 1])


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
