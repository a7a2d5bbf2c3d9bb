"""Native C++ component tests: speckle filter, occlusion fill, PNM/PFM IO."""

import numpy as np
import pytest

from stereo_tpu import native


def _speckle_scene():
    disp = np.full((20, 30), 10.0, dtype=np.float32)
    valid = np.ones((20, 30), dtype=bool)
    disp[5:7, 5:8] = 42.0      # 6-px speckle (should go at max_size>6)
    disp[12:18, 10:20] = 30.0  # 60-px region (should stay)
    disp[0, 29] = 99.0         # 1-px speckle
    return disp, valid


def test_speckle_filter_removes_small_components():
    disp, valid = _speckle_scene()
    out_d, out_v, removed = native.filter_speckles(disp, valid, tau=1.0, max_size=10)
    assert removed == 7
    assert not out_v[5, 5] and not out_v[0, 29]
    assert out_v[13, 12]          # big region survives
    assert out_v[0, 0]            # background survives
    # inputs untouched
    assert valid.all()


def test_speckle_filter_tau_merges_components():
    """With a large tau the 'speckle' connects to background and survives."""
    disp, valid = _speckle_scene()
    _, out_v, removed = native.filter_speckles(disp, valid, tau=100.0, max_size=10)
    assert removed == 0
    assert out_v.all()


def test_speckle_native_matches_python_fallback():
    rng = np.random.default_rng(0)
    disp = (rng.integers(0, 5, size=(24, 32)) * 3).astype(np.float32)
    valid = rng.random((24, 32)) > 0.2
    n_d, n_v, n_rem = native.filter_speckles(disp, valid, 1.0, 8)
    p_d, p_v, p_rem = native._filter_speckles_py(
        disp.copy(), valid.astype(np.uint8).copy(), 1.0, 8, False
    )
    assert n_rem == p_rem
    np.testing.assert_array_equal(n_v, p_v)


def test_speckle_matches_opencv():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    base16 = (rng.integers(0, 4, size=(40, 60)) * 5).astype(np.int16)
    valid = np.ones(base16.shape, dtype=bool)
    ours_d, ours_v, _ = native.filter_speckles(
        base16.astype(np.float32), valid, tau=1.0, max_size=20
    )
    cv = base16.copy()
    cv2.filterSpeckles(cv, -1, 20, 1)
    np.testing.assert_array_equal(ours_v, cv != -1)


def test_fill_invalid_lr():
    disp = np.array([[5.0, 0.0, 0.0, 9.0]], dtype=np.float32)
    valid = np.array([[1, 0, 0, 1]], dtype=bool)
    out_d, out_v, _ = native.filter_speckles(
        disp, valid, tau=1.0, max_size=0, fill_invalid=True
    )
    # occlusion fill takes the SMALLER neighbor (background)
    np.testing.assert_array_equal(out_d, [[5.0, 5.0, 5.0, 9.0]])


def test_fill_invalid_lr_standalone():
    """The product-surface wrapper: returns filled disp + filled mask."""
    disp = np.array(
        [[5.0, 0.0, 0.0, 9.0], [0.0, 0.0, 0.0, 0.0]], dtype=np.float32
    )
    valid = np.array([[1, 0, 0, 1], [0, 0, 0, 0]], dtype=bool)
    out_d, filled = native.fill_invalid_lr(disp, valid)
    np.testing.assert_array_equal(out_d[0], [5.0, 5.0, 5.0, 9.0])
    np.testing.assert_array_equal(filled[0], [False, True, True, False])
    # all-invalid rows cannot be filled and stay untouched
    np.testing.assert_array_equal(out_d[1], disp[1])
    assert not filled[1].any()
    # inputs unmodified
    assert disp[0, 1] == 0.0


def test_fill_invalid_lr_fallback_matches_native(monkeypatch):
    if native.load() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(5)
    disp = rng.uniform(0, 60, size=(18, 25)).astype(np.float32)
    valid = rng.random((18, 25)) > 0.4
    valid[3] = False  # one unfillable row
    n_d, n_f = native.fill_invalid_lr(disp, valid)
    monkeypatch.setattr(native, "load", lambda: None)
    p_d, p_f = native.fill_invalid_lr(disp, valid)
    np.testing.assert_array_equal(n_d, p_d)
    np.testing.assert_array_equal(n_f, p_f)


def test_pnm_roundtrip(tmp_path):
    if native.load() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(17, 23)).astype(np.uint8)
    p = str(tmp_path / "x.pgm")
    assert native.write_pnm_gray(p, img)
    back = native.read_pnm_gray(p)
    np.testing.assert_array_equal(back, img)


def test_pnm_matches_pil(tmp_path):
    if native.load() is None:
        pytest.skip("no native toolchain")
    from PIL import Image

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(11, 13, 3)).astype(np.uint8)
    p = str(tmp_path / "x.ppm")
    Image.fromarray(rgb).save(p)
    ours = native.read_pnm_gray(p)
    pil = np.asarray(Image.open(p).convert("L"))
    np.testing.assert_array_equal(ours, pil)


def test_pfm_native_matches_python(tmp_path):
    if native.load() is None:
        pytest.skip("no native toolchain")
    from stereo_tpu.data.middlebury import write_pfm

    rng = np.random.default_rng(4)
    data = rng.uniform(0, 100, size=(9, 14)).astype(np.float32)
    p = str(tmp_path / "d.pfm")
    write_pfm(p, data)
    got = native.read_pfm_native(p)
    np.testing.assert_allclose(got, data, rtol=0, atol=0)
