"""Census transform golden tests against a naive numpy oracle."""

import numpy as np
import pytest

from stereo_tpu.ops import census_transform, hamming_distance


def naive_census(img, wy, wx):
    h, w = img.shape
    ry, rx = wy // 2, wx // 2
    p = np.pad(img.astype(np.int64), ((ry, ry), (rx, rx)), mode="edge")
    bits = wy * wx - 1
    n_words = (bits + 31) // 32
    out = np.zeros((h, w, n_words), dtype=np.uint32)
    for y in range(h):
        for x in range(w):
            center = img[y, x]
            k = 0
            for dy in range(wy):
                for dx in range(wx):
                    if dy == ry and dx == rx:
                        continue
                    if p[y + dy, x + dx] < center:
                        out[y, x, k // 32] |= np.uint32(1 << (k % 32))
                    k += 1
    return out


@pytest.mark.parametrize("window", [(3, 3), (5, 5), (7, 5), (9, 7)])
def test_census_matches_naive(window):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(13, 17)).astype(np.uint8)
    got = np.array(census_transform(img, window))
    want = naive_census(img, *window)
    np.testing.assert_array_equal(got, want)


def test_census_word_count():
    img = np.zeros((4, 4), dtype=np.uint8)
    assert census_transform(img, (5, 5)).shape == (4, 4, 1)   # 24 bits
    assert census_transform(img, (9, 7)).shape == (4, 4, 2)   # 62 bits


def test_census_radiometric_invariance():
    """Census is invariant to monotonic intensity transforms."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 100, size=(10, 10)).astype(np.uint8)
    scaled = (img.astype(np.int32) * 2 + 10).astype(np.uint8)
    a = np.array(census_transform(img, (5, 5)))
    b = np.array(census_transform(scaled, (5, 5)))
    np.testing.assert_array_equal(a, b)


def test_hamming_distance():
    a = np.array([[0b1011, 0b1]], dtype=np.uint32)
    b = np.array([[0b0010, 0b0]], dtype=np.uint32)
    # xor = 0b1001 (2 bits) , 0b1 (1 bit) -> 3
    assert int(hamming_distance(a, b)[0]) == 3
    assert int(hamming_distance(a, a)[0]) == 0
