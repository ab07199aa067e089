"""MetaImage (.mha/.mhd) and NRRD roundtrip + SimpleITKIO dispatch tests
(reference simpleitk_reader_writer.py:23-27 supports .nii.gz/.nrrd/.mha)."""
import numpy as np
import pytest

from mlagg_unet_tpu.imageio.metaimage_io import (
    MetaImageIO,
    read_metaimage,
    write_metaimage,
)
from mlagg_unet_tpu.imageio.nifti_io import SimpleITKIO
from mlagg_unet_tpu.imageio.nrrd_io import NrrdIO, read_nrrd, write_nrrd
from mlagg_unet_tpu.imageio.reader_writer_registry import (
    determine_reader_writer_from_file_ending,
)


@pytest.mark.parametrize("compressed", [True, False])
def test_metaimage_roundtrip(tmp_path, rng, compressed):
    data = (rng.rand(5, 6, 7) * 200).astype(np.uint8)
    f = str(tmp_path / "x.mha")
    write_metaimage(f, data, (1.5, 2.0, 3.0), compressed=compressed)
    back, hdr = read_metaimage(f)
    np.testing.assert_array_equal(back, data)
    assert hdr["ElementSpacing"].split() == ["1.5", "2.0", "3.0"]
    assert hdr["DimSize"].split() == ["7", "6", "5"]  # x y z on disk


@pytest.mark.parametrize("dtype", [np.int16, np.float32, np.uint8])
def test_metaimage_dtypes(tmp_path, rng, dtype):
    data = (rng.randn(4, 5, 6) * 50).astype(dtype)
    f = str(tmp_path / "x.mha")
    write_metaimage(f, data, (1, 1, 1))
    back, _ = read_metaimage(f)
    np.testing.assert_array_equal(back, data)


@pytest.mark.parametrize("compressed", [True, False])
def test_nrrd_roundtrip(tmp_path, rng, compressed):
    data = (rng.rand(5, 6, 7) * 200).astype(np.uint8)
    f = str(tmp_path / "x.nrrd")
    write_nrrd(f, data, (1.5, 2.0, 3.0), compressed=compressed)
    back, hdr = read_nrrd(f)
    np.testing.assert_array_equal(back, data)
    assert hdr["sizes"].split() == ["7", "6", "5"]


def test_nrrd_space_directions_spacing(tmp_path, rng):
    data = (rng.rand(3, 4, 5) * 9).astype(np.int16)
    f = str(tmp_path / "x.nrrd")
    write_nrrd(f, data, (2.0, 0.5, 1.25))
    img, props = NrrdIO().read_images([f])
    assert img.shape == (1, 3, 4, 5)
    np.testing.assert_allclose(props["spacing"], (1.25, 0.5, 2.0))


def test_io_class_contract_and_seg_roundtrip(tmp_path, rng):
    for cls, ending in ((MetaImageIO, ".mha"), (NrrdIO, ".nrrd")):
        io = cls()
        seg = (rng.rand(4, 5, 6) > 0.6).astype(np.uint8)
        src = str(tmp_path / f"img{ending}")
        if ending == ".mha":
            write_metaimage(src, seg, (1.0, 2.0, 4.0))
        else:
            write_nrrd(src, seg, (1.0, 2.0, 4.0))
        img, props = io.read_images([src])
        assert img.dtype == np.float32 and img.shape == (1, 4, 5, 6)
        assert props["spacing"] == (4.0, 2.0, 1.0)
        out = str(tmp_path / f"seg{ending}")
        io.write_seg(img[0].astype(np.uint8), out, props)
        back, props2 = io.read_seg(out)
        np.testing.assert_array_equal(back[0], seg)
        assert props2["spacing"] == props["spacing"]


def test_simpleitkio_dispatch(tmp_path, rng):
    """plans.json files naming SimpleITKIO must read all three families."""
    seg = (rng.rand(3, 4, 5) * 3).astype(np.uint8)
    io = SimpleITKIO()
    props = {"spacing": (1.0, 1.0, 1.0)}
    for ending in (".nii.gz", ".mha", ".nrrd"):
        f = str(tmp_path / ("x" + ending))
        io.write_seg(seg, f, props)
        back, p = io.read_seg(f)
        np.testing.assert_array_equal(back[0], seg)
        assert tuple(p["spacing"]) == (1.0, 1.0, 1.0)


def test_registry_resolves_new_endings():
    assert determine_reader_writer_from_file_ending(".mha").__name__ in (
        "NiftiIO", "SimpleITKIO", "MetaImageIO")
    cls = determine_reader_writer_from_file_ending(".nrrd")
    assert cls.supported_file_endings  # resolves without error


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32])
def test_gipl_roundtrip(tmp_path, rng, dtype):
    from mlagg_unet_tpu.imageio.gipl_io import read_gipl, write_gipl

    data = (rng.randn(5, 6, 7) * 50).astype(dtype)
    f = str(tmp_path / "x.gipl")
    write_gipl(f, data, (1.5, 2.0, 3.0), origin_xyz=(4.0, 5.0, 6.0))
    back, hdr = read_gipl(f)
    np.testing.assert_array_equal(back, data)
    assert hdr["dims"][:3] == (7, 6, 5)  # x y z on disk
    np.testing.assert_allclose(hdr["pixdim"][:3], (1.5, 2.0, 3.0))
    np.testing.assert_allclose(hdr["origin"][:3], (4.0, 5.0, 6.0))


def test_gipl_io_class_contract(tmp_path, rng):
    from mlagg_unet_tpu.imageio.gipl_io import GiplIO, write_gipl

    io = GiplIO()
    seg = (rng.rand(4, 5, 6) > 0.6).astype(np.uint8)
    src = str(tmp_path / "img.gipl")
    write_gipl(src, seg, (1.0, 2.0, 4.0))
    img, props = io.read_images([src])
    assert img.dtype == np.float32 and img.shape == (1, 4, 5, 6)
    assert props["spacing"] == (4.0, 2.0, 1.0)
    out = str(tmp_path / "seg.gipl")
    io.write_seg(img[0].astype(np.uint8), out, props)
    back, props2 = io.read_seg(out)
    np.testing.assert_array_equal(back[0], seg)
    assert props2["spacing"] == props["spacing"]


def test_gipl_registry_and_simpleitkio_dispatch(tmp_path, rng):
    cls = determine_reader_writer_from_file_ending(".gipl")
    assert cls.supported_file_endings
    seg = (rng.rand(3, 4, 5) * 3).astype(np.uint8)
    io = SimpleITKIO()
    props = {"spacing": (1.0, 1.0, 1.0)}
    f = str(tmp_path / "x.gipl")
    io.write_seg(seg, f, props)
    back, p = io.read_seg(f)
    np.testing.assert_array_equal(back[0], seg)
    assert tuple(p["spacing"]) == (1.0, 1.0, 1.0)
