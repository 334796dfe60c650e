"""Native C++ decode/resample vs PIL (builds native/dataloader.cc on demand)."""

import numpy as np
import pytest

from text2human_tpu.data import native_loader as nl

PIL_Image = pytest.importorskip("PIL.Image")

if not nl.available():  # toolchain missing in this environment
    pytest.skip("native loader could not be built", allow_module_level=True)


@pytest.fixture
def png_rgb(tmp_path, rng):
    arr = rng.integers(0, 255, (32, 24, 3)).astype(np.uint8)
    path = tmp_path / "img.png"
    PIL_Image.fromarray(arr).save(path)
    return str(path), arr


def test_png_roundtrip_exact(png_rgb):
    path, arr = png_rgb
    got = nl.decode_image(path, downsample=1)
    np.testing.assert_array_equal(got, arr)
    assert nl.image_size(path) == (32, 24, 3)


def test_jpeg_decode_matches_pil(tmp_path, rng):
    arr = rng.integers(0, 255, (32, 24, 3)).astype(np.uint8)
    path = tmp_path / "img.jpg"
    PIL_Image.fromarray(arr).save(path, format="JPEG", quality=95)
    got = nl.decode_image(str(path))
    want = np.array(PIL_Image.open(path))
    # libjpeg IDCT variants may differ by a ULP or two from PIL's build
    assert got.shape == want.shape
    assert np.mean(np.abs(got.astype(int) - want.astype(int))) < 1.0


def test_nearest_downsample_matches_pil(tmp_path, rng):
    arr = rng.integers(0, 24, (32, 24)).astype(np.uint8)
    path = tmp_path / "mask.png"
    PIL_Image.fromarray(arr, mode="L").save(path)
    got = nl.decode_image(str(path), downsample=2, filter=nl.NEAREST)
    want = np.array(
        PIL_Image.open(path).resize((12, 16), resample=PIL_Image.NEAREST)
    )
    np.testing.assert_array_equal(got, want)


def test_lanczos_downsample_close_to_pil(png_rgb):
    path, _ = png_rgb
    got = nl.decode_image(path, downsample=2, filter=nl.LANCZOS)
    want = np.array(
        PIL_Image.open(path).resize((12, 16), resample=PIL_Image.LANCZOS)
    )
    assert got.shape == want.shape
    diff = np.abs(got.astype(int) - want.astype(int))
    # PIL uses 8-bit fixed-point kernel coefficients; float accumulation
    # differs by at most a couple of levels
    assert diff.max() <= 2, diff.max()
    assert diff.mean() < 0.5


def test_batch_decode_threads(tmp_path, rng):
    paths = []
    arrs = []
    for i in range(8):
        arr = rng.integers(0, 255, (16, 12, 3)).astype(np.uint8)
        p = tmp_path / f"b{i}.png"
        PIL_Image.fromarray(arr).save(p)
        paths.append(str(p))
        arrs.append(arr)
    out = nl.decode_batch(paths, 16, 12, channels=3, filter=nl.LANCZOS, num_threads=4)
    np.testing.assert_array_equal(out, np.stack(arrs))


def test_dataset_native_path_matches_pil(tmp_path, monkeypatch, rng):
    """T2H_NATIVE_LOADER=1 routes the flat-file datasets through the native
    decoder; masks must be identical and images match within resample noise."""
    import sys

    sys.path.insert(0, "tests")
    from test_data_utils import _write_fixture_tree

    from text2human_tpu.data.datasets import DeepFashionAttrSegmDataset

    _write_fixture_tree(tmp_path)
    args = (
        str(tmp_path / "images"), str(tmp_path / "segm"),
        str(tmp_path / "densepose"), str(tmp_path / "texture_ann" / "train"),
    )
    pil_item = DeepFashionAttrSegmDataset(*args)[0]
    monkeypatch.setenv("T2H_NATIVE_LOADER", "1")
    nat_item = DeepFashionAttrSegmDataset(*args)[0]

    np.testing.assert_array_equal(nat_item["segm"], pil_item["segm"])
    np.testing.assert_array_equal(nat_item["densepose"], pil_item["densepose"])
    np.testing.assert_array_equal(nat_item["texture_mask"], pil_item["texture_mask"])
    assert (
        np.abs(nat_item["image"] - pil_item["image"]).max() <= 2.5 / 127.5
    )


def test_palette_png_keeps_indices(tmp_path, rng):
    """P-mode PNGs must decode to raw palette INDICES like PIL (class maps
    are commonly stored this way); expanding to RGB would corrupt segm ids."""
    nl.load_library(rebuild=True)  # pick up source changes within a session
    ids = rng.integers(0, 24, (16, 12)).astype(np.uint8)
    img = PIL_Image.fromarray(ids, mode="P")
    img.putpalette([v for i in range(256) for v in (i, 0, 255 - i)])
    path = tmp_path / "pal.png"
    img.save(path)

    want = np.array(PIL_Image.open(path))
    assert want.ndim == 2  # PIL returns indices
    got = nl.decode_image(str(path))
    np.testing.assert_array_equal(got, want)
    assert nl.image_size(str(path))[2] == 1
    # and downsampled with NEAREST like a mask
    got2 = nl.decode_image(str(path), downsample=2, filter=nl.NEAREST)
    want2 = np.array(PIL_Image.open(path).resize((6, 8), PIL_Image.NEAREST))
    np.testing.assert_array_equal(got2, want2)


def test_decode_channel_matches_slice(tmp_path, rng):
    """Native channel-select (densepose-IUV fast path) equals decoding all
    channels then slicing, at native and downsampled geometry."""
    arr = rng.integers(0, 255, (32, 24, 3)).astype(np.uint8)
    path = tmp_path / "iuv.png"
    PIL_Image.fromarray(arr).save(path)

    for ch in range(3):
        got = nl.decode_channel(str(path), channel=ch)
        np.testing.assert_array_equal(got, arr[:, :, ch])
    got2 = nl.decode_channel(str(path), channel=2, downsample=2, filter=nl.NEAREST)
    want2 = np.array(
        PIL_Image.open(path).resize((12, 16), PIL_Image.NEAREST)
    )[:, :, 2]
    np.testing.assert_array_equal(got2, want2)

    with pytest.raises(IOError):
        nl.decode_channel(str(path), channel=5)
