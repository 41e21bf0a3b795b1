"""Native C++ image loader: decode parity, preprocess parity, dataset
integration, corrupt-file fallback."""

import os

import numpy as np
import pytest
from PIL import Image

from magma_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native loader unavailable: {native.build_error()}",
)


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (300, 451, 3), np.uint8)
    Image.fromarray(arr).save(d / "a.png")
    Image.fromarray(arr).save(d / "a.jpg", quality=95)
    Image.fromarray(arr[..., 0]).save(d / "gray.png")        # grayscale
    Image.fromarray(
        np.dstack([arr, np.full(arr.shape[:2], 200, np.uint8)])
    ).save(d / "rgba.png")                                   # alpha
    (d / "corrupt.jpg").write_bytes(b"\xff\xd8\xff\xe0garbage")
    return d


def test_decode_parity_with_pil(img_dir):
    for name in ("a.png", "a.jpg", "gray.png"):
        dec = native.decode(img_dir / name)
        pil = np.asarray(Image.open(img_dir / name).convert("RGB"))
        assert dec.shape == pil.shape
        # png paths are bit-exact; jpeg decoders may round differently
        assert np.abs(dec.astype(int) - pil.astype(int)).max() <= 1, name


def test_load_clip_matches_pil_xla_pipeline(img_dir):
    from magma_tpu.data.transforms import clip_transform

    tf = clip_transform(128)
    for name in ("a.png", "a.jpg"):
        a = native.load_clip(img_dir / name, 128)
        b = np.asarray(tf(Image.open(img_dir / name)))
        assert a.shape == b.shape == (1, 3, 128, 128)
        assert float(np.abs(a - b).mean()) < 5e-3, name


def test_corrupt_file_raises(img_dir):
    with pytest.raises(IOError):
        native.load_clip(img_dir / "corrupt.jpg", 64)
    with pytest.raises(IOError):
        native.decode(img_dir / "missing.jpg")


def test_get_transforms_prefers_native(img_dir):
    from magma_tpu.data.transforms import get_transforms

    tf = get_transforms(384, "clip_resnet_large", input_resolution=128)
    assert getattr(tf, "wants_path", False)
    out = tf(img_dir / "a.jpg")                  # path input: native
    assert out.shape == (1, 3, 128, 128)
    out2 = tf(Image.open(img_dir / "a.jpg"))     # PIL input: fallback
    np.testing.assert_allclose(out, out2, atol=5e-3)
    # non-clip encoders keep the random-aug PIL pipeline
    tf2 = get_transforms(64, "nfresnet50")
    assert not getattr(tf2, "wants_path", False)


def test_dataset_uses_native_path(tmp_path):
    from magma_tpu.data.convert import convert_dataset
    from magma_tpu.data.dataset import ImgCptDataset
    from magma_tpu.data.transforms import get_transforms
    from magma_tpu.tokenizer import get_tokenizer

    rng = np.random.RandomState(1)

    def it():
        for i in range(4):
            p = tmp_path / f"s{i}.jpg"
            Image.fromarray(
                rng.randint(0, 255, (80, 100, 3), np.uint8)
            ).save(p)
            yield str(p), {"captions": [f"caption {i}"], "metadata": {}}

    ds_dir = tmp_path / "ds"
    convert_dataset(ds_dir, ds_iterator=it(), mode="cp")
    tf = get_transforms(64, "clip_resnet", input_resolution=64)
    assert getattr(tf, "wants_path", False)
    ds = ImgCptDataset(ds_dir, get_tokenizer("gpt2", 32), tf, seq_len=32)
    img, cpt = ds[0]
    assert img.shape == (1, 3, 64, 64) and img.dtype == np.float32
    assert cpt.shape == (1, 32)


def test_png_with_trns_transparency_decodes(tmp_path):
    """A palette PNG carrying a tRNS chunk must decode (tRNS_to_alpha adds
    a 4th channel to images whose color type has no alpha bit; the strip
    must account for that or every such PNG is rejected)."""
    rng = np.random.RandomState(0)
    arr = (rng.rand(24, 24, 3) * 255).astype(np.uint8)
    img = Image.fromarray(arr).convert("P", palette=Image.ADAPTIVE)
    path = tmp_path / "trns.png"
    img.save(path, transparency=0)  # writes a tRNS chunk
    out = native.decode(str(path))
    assert out.shape == (24, 24, 3)
    ref = np.asarray(Image.open(path).convert("RGB"))
    np.testing.assert_array_equal(out, ref)


def test_webp_falls_back_to_pil(tmp_path):
    """Formats the native decoder does not handle go through PIL instead
    of being dropped as corrupt samples."""
    from magma_tpu.native import NativeClipTransform

    rng = np.random.RandomState(1)
    arr = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
    path = tmp_path / "img.webp"
    try:
        Image.fromarray(arr).save(path)
    except (OSError, KeyError):
        pytest.skip("PIL lacks WebP support in this environment")
    t = NativeClipTransform(n_px=32)
    out = t(str(path))
    assert out.shape == (1, 3, 32, 32)
