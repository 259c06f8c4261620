"""Dependency-free PNG decode (utils/png.py:read_png): must round-trip
the repo's own writer and agree byte-exactly with PIL on PIL-encoded
files (which exercise the Sub/Up/Average/Paeth filters and palette /
grayscale color types the writer never emits)."""

import numpy as np
import pytest

from tpu_raytracing.utils.png import read_png, write_png


def _noise(h, w, c, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, c), dtype=np.uint8)


def test_roundtrip_own_writer(tmp_path):
    img = _noise(33, 47, 4)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    np.testing.assert_array_equal(read_png(p), img)


def test_roundtrip_rgb(tmp_path):
    img = _noise(16, 21, 3, 1)
    p = str(tmp_path / "t3.png")
    write_png(p, img)
    out = read_png(p)
    np.testing.assert_array_equal(out[:, :, :3], img)
    assert (out[:, :, 3] == 255).all()


@pytest.mark.parametrize("mode,ctype", [
    ("L", 0), ("RGB", 2), ("P", 3), ("LA", 4), ("RGBA", 6)])
def test_matches_pil_all_color_types(tmp_path, mode, ctype):
    PIL = pytest.importorskip("PIL.Image")
    # gradients + noise make the encoder pick varied per-row filters
    img = _noise(40, 56, 4, 2 + ctype)
    img[:, :, 0] = np.arange(56, dtype=np.uint8)[None, :].repeat(40, 0)
    im = PIL.fromarray(img, "RGBA").convert(mode)
    p = str(tmp_path / f"c{ctype}.png")
    im.save(p)
    ours = read_png(p)
    theirs = np.asarray(PIL.open(p).convert("RGBA"), np.uint8)
    np.testing.assert_array_equal(ours, theirs)


def test_rejects_non_png(tmp_path):
    p = str(tmp_path / "x.png")
    with open(p, "wb") as fp:
        fp.write(b"not a png at all")
    with pytest.raises(ValueError):
        read_png(p)
