"""Native IO runtime: build, prefetch, queue semantics, TUM writer."""

import threading
import time

import numpy as np
import pytest

from ur_mvo_tpu import native


pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def _write_pgm(path, img):
    with open(path, "wb") as f:
        f.write(b"P5\n# test\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        f.write(img.tobytes())


def test_prefetcher_pgm_and_npy(tmp_path):
    paths = []
    for i in range(12):
        img = np.full((16, 20), i, np.uint8)
        if i % 2 == 0:
            p = tmp_path / f"{i:03d}.pgm"
            _write_pgm(str(p), img)
        else:
            p = tmp_path / f"{i:03d}.npy"
            np.save(str(p), img)
        paths.append(str(p))
    pf = native.ImagePrefetcher(paths, n_workers=3, window=4)
    for i, img in enumerate(pf):
        assert img.shape == (16, 20)
        assert img[0, 0] == i
    pf.close()


def test_prefetcher_in_order_with_backpressure(tmp_path):
    paths = []
    for i in range(30):
        p = tmp_path / f"{i:04d}.npy"
        np.save(str(p), np.full((8, 8), i % 256, np.uint8))
        paths.append(str(p))
    pf = native.ImagePrefetcher(paths, n_workers=4, window=3)
    got = [int(pf.get(i)[0, 0]) for i in range(30)]
    assert got == list(range(30))
    pf.close()


def test_bounded_queue_blocking():
    q = native.BoundedQueue(capacity=2)
    q.push(np.arange(5, dtype=np.uint8))
    q.push(np.arange(3, dtype=np.uint8))
    assert len(q) == 2

    results = []

    def producer():
        q.push(np.arange(7, dtype=np.uint8))  # blocks until a pop
        results.append("pushed")

    t = threading.Thread(target=producer)
    t.start()
    time.sleep(0.1)
    assert not results  # producer is blocked on the full queue
    out = q.pop()
    assert out.size == 5
    t.join(timeout=2)
    assert results == ["pushed"]
    q.close()
    q.destroy()


def test_native_tum_writer(tmp_path):
    from ur_mvo_tpu.utils.tum_io import read_tum

    path = str(tmp_path / "traj.txt")
    w = native.NativeTumWriter(path)
    w.write(1.5, np.array([1.0, 2.0, 3.0]), np.array([1.0, 0.0, 0.0, 0.0]))
    w.write(2.5, np.array([4.0, 5.0, 6.0]), np.array([0.0, 0.0, 0.0, 1.0]))
    w.close()
    ts, pos, quat = read_tum(path)
    np.testing.assert_allclose(ts, [1.5, 2.5])
    np.testing.assert_allclose(pos[1], [4.0, 5.0, 6.0])
    np.testing.assert_allclose(quat[0], [1.0, 0.0, 0.0, 0.0])
