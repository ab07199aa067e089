"""Pure-NumPy NIfTI-1 reader/writer.

Replaces the reference's SimpleITK/NiBabel readers
(mlagg/nnunetv2/imageio/simpleitk_reader_writer.py, nibabel_reader_writer.py)
— neither library is available in this environment, and the NIfTI-1 format is
simple enough to implement directly: a 348-byte header + optional gzip.

Data contract matches the reference: images come back as (c, x, y, z)
float32 with spacing ordered (z, y, x)-style "reversed" the way SimpleITK's
GetSpacing()[::-1] produces it, so downstream geometry handling is identical.
We store the full header of the first-read image in the properties so
write_seg can round-trip affine/geometry losslessly.
"""
from __future__ import annotations

import gzip
import struct
from typing import List, Tuple, Union

import numpy as np

from mlagg_unet_tpu.imageio.base_reader_writer import BaseReaderWriter

_DTYPES = {
    2: np.uint8,
    4: np.int16,
    8: np.int32,
    16: np.float32,
    64: np.float64,
    256: np.int8,
    512: np.uint16,
    768: np.uint32,
    1024: np.int64,
    1280: np.uint64,
}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


def _open_maybe_gz(fname: str, mode: str):
    if fname.endswith(".gz"):
        return gzip.open(fname, mode)
    return open(fname, mode)


def read_nifti(fname: str) -> Tuple[np.ndarray, dict]:
    """Returns (data array in on-disk (x, y, z[, t]) order, header dict)."""
    with _open_maybe_gz(fname, "rb") as f:
        raw = f.read()
    hdr = raw[:348]
    sizeof_hdr = struct.unpack("<i", hdr[0:4])[0]
    if sizeof_hdr != 348:
        # try big endian
        endian = ">"
        sizeof_hdr = struct.unpack(">i", hdr[0:4])[0]
        assert sizeof_hdr == 348, f"not a NIfTI-1 file: {fname}"
    else:
        endian = "<"

    dim = struct.unpack(endian + "8h", hdr[40:56])
    ndim = dim[0]
    shape = tuple(int(d) for d in dim[1: 1 + ndim])
    datatype = struct.unpack(endian + "h", hdr[70:72])[0]
    bitpix = struct.unpack(endian + "h", hdr[72:74])[0]
    pixdim = struct.unpack(endian + "8f", hdr[76:108])
    vox_offset = int(struct.unpack(endian + "f", hdr[108:112])[0])
    scl_slope = struct.unpack(endian + "f", hdr[112:116])[0]
    scl_inter = struct.unpack(endian + "f", hdr[116:120])[0]
    qform_code = struct.unpack(endian + "h", hdr[252:254])[0]
    sform_code = struct.unpack(endian + "h", hdr[254:256])[0]
    quatern = struct.unpack(endian + "6f", hdr[256:280])
    srows = struct.unpack(endian + "12f", hdr[280:328])
    magic = hdr[344:348]
    assert magic[:2] in (b"n+", b"ni"), f"bad NIfTI magic in {fname}"

    dtype = np.dtype(_DTYPES[datatype]).newbyteorder(endian)
    count = int(np.prod(shape))
    data = np.frombuffer(
        raw, dtype=dtype, count=count, offset=vox_offset
    ).reshape(shape, order="F")

    if scl_slope not in (0.0, 1.0) or scl_inter != 0.0:
        slope = scl_slope if scl_slope != 0 else 1.0
        data = data.astype(np.float32) * slope + scl_inter

    header = {
        "shape": shape,
        "pixdim": tuple(float(p) for p in pixdim[1: 1 + max(ndim, 3)]),
        "qfac": float(pixdim[0]) if pixdim[0] in (-1.0, 1.0) else 1.0,
        "datatype": int(datatype),
        "bitpix": int(bitpix),
        "qform_code": int(qform_code),
        "sform_code": int(sform_code),
        "quatern": tuple(float(q) for q in quatern),
        "srows": tuple(float(s) for s in srows),
        "endian": endian,
    }
    return np.asarray(data), header


def write_nifti(fname: str, data: np.ndarray, spacing_xyz, header: dict = None
                ) -> None:
    """Write (x, y, z) data. If a header dict from read_nifti is given, the
    affine (srow/quaternion) info is preserved."""
    data = np.asarray(data)
    if data.dtype not in _DTYPE_CODES:
        data = data.astype(np.float32)
    ndim = data.ndim
    dim = [ndim] + list(data.shape) + [1] * (7 - ndim)
    pixdim = [1.0] + [float(s) for s in spacing_xyz] + [1.0] * (7 - len(spacing_xyz))

    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, *dim)
    struct.pack_into("<h", hdr, 70, _DTYPE_CODES[np.dtype(data.dtype)])
    struct.pack_into("<h", hdr, 72, data.dtype.itemsize * 8)
    struct.pack_into("<8f", hdr, 76, *pixdim)
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)    # scl_slope
    struct.pack_into("<f", hdr, 116, 0.0)    # scl_inter
    if header is not None:
        struct.pack_into("<h", hdr, 252, header.get("qform_code", 0))
        struct.pack_into("<h", hdr, 254, header.get("sform_code", 1))
        struct.pack_into("<6f", hdr, 256, *header.get("quatern", (0.0,) * 6))
        struct.pack_into("<12f", hdr, 280, *header.get("srows", (0.0,) * 12))
    else:
        # default diagonal sform from spacing
        struct.pack_into("<h", hdr, 254, 1)
        sx, sy, sz = (list(spacing_xyz) + [1.0, 1.0, 1.0])[:3]
        srows = (float(sx), 0, 0, 0, 0, float(sy), 0, 0, 0, 0, float(sz), 0)
        struct.pack_into("<12f", hdr, 280, *srows)
    hdr[344:348] = b"n+1\x00"

    payload = bytes(hdr) + b"\x00" * 4 + np.asfortranarray(data).tobytes(order="F")
    with _open_maybe_gz(fname, "wb") as f:
        f.write(payload)


class NiftiIO(BaseReaderWriter):
    """(c, x, y, z) with x=slowest on-disk axis reversed — matches the
    reference SimpleITKIO's transpose convention (arrays come out in
    (z, y, x) index order relative to the on-disk (x, y, z))."""

    supported_file_endings = [".nii", ".nii.gz"]

    def read_images(self, image_fnames) -> Tuple[np.ndarray, dict]:
        images, spacings, headers = [], [], []
        for f in image_fnames:
            data, hdr = read_nifti(f)
            if data.ndim == 2:
                data = data[:, :, None]
            assert data.ndim == 3, (
                f"only 2d/3d images supported, got shape {data.shape} in {f}"
            )
            # on-disk (x, y, z) fortran -> index order (z, y, x)
            images.append(data.transpose(2, 1, 0)[None].astype(np.float32))
            spacings.append(tuple(hdr["pixdim"][:3][::-1]))
            headers.append(hdr)
        if not self._check_all_same([i.shape for i in images]):
            raise RuntimeError(f"image shapes differ: {image_fnames}")
        if not self._check_all_same(spacings):
            raise RuntimeError(f"image spacings differ: {image_fnames}")
        props = {"spacing": spacings[0], "nifti_header": headers[0]}
        return np.vstack(images), props

    def read_seg(self, seg_fname: str) -> Tuple[np.ndarray, dict]:
        return self.read_images([seg_fname])

    def write_seg(self, seg: np.ndarray, output_fname: str, properties: dict
                  ) -> None:
        assert seg.ndim == 3
        data = seg.transpose(2, 1, 0)  # back to on-disk (x, y, z)
        spacing_xyz = tuple(properties["spacing"][::-1])
        write_nifti(output_fname, data.astype(np.uint8, copy=False),
                    spacing_xyz, properties.get("nifti_header"))


class SimpleITKIO(NiftiIO):
    """Name-compatible with the reference SimpleITKIO
    (simpleitk_reader_writer.py:23-27: .nii.gz + .nrrd + .mha) so
    reference-generated plans.json files resolve AND keep their format
    breadth: dispatches per file extension to the pure-NumPy NIfTI,
    MetaImage, or NRRD codec."""

    supported_file_endings = [".nii", ".nii.gz", ".mha", ".mhd", ".nrrd",
                              ".gipl"]

    @staticmethod
    def _delegate(fname: str):
        low = fname.lower()
        if low.endswith((".mha", ".mhd")):
            from mlagg_unet_tpu.imageio.metaimage_io import MetaImageIO

            return MetaImageIO()
        if low.endswith(".nrrd"):
            from mlagg_unet_tpu.imageio.nrrd_io import NrrdIO

            return NrrdIO()
        if low.endswith(".gipl"):
            from mlagg_unet_tpu.imageio.gipl_io import GiplIO

            return GiplIO()
        return None

    def read_images(self, image_fnames) -> Tuple[np.ndarray, dict]:
        d = self._delegate(image_fnames[0])
        if d is not None:
            return d.read_images(image_fnames)
        return super().read_images(image_fnames)

    def read_seg(self, seg_fname: str) -> Tuple[np.ndarray, dict]:
        return self.read_images([seg_fname])

    def write_seg(self, seg: np.ndarray, output_fname: str, properties: dict
                  ) -> None:
        d = self._delegate(output_fname)
        if d is not None:
            return d.write_seg(seg, output_fname, properties)
        return super().write_seg(seg, output_fname, properties)


class NibabelIO(NiftiIO):
    """Name-compatible alias (reference nibabel_reader_writer.py)."""


def _affine_from_header(hdr: dict) -> np.ndarray:
    """NIfTI affine: sform if sform_code > 0, else qform, else diag(pixdim)."""
    if hdr.get("sform_code", 0) > 0:
        sr = hdr["srows"]
        return np.array([sr[0:4], sr[4:8], sr[8:12], [0.0, 0.0, 0.0, 1.0]])
    pix = list(hdr["pixdim"][:3]) + [1.0, 1.0, 1.0]
    if hdr.get("qform_code", 0) > 0:
        b, c, d, ox, oy, oz = hdr["quatern"]
        a = float(np.sqrt(max(0.0, 1.0 - b * b - c * c - d * d)))
        rot = np.array([
            [a * a + b * b - c * c - d * d, 2 * (b * c - a * d),
             2 * (b * d + a * c)],
            [2 * (b * c + a * d), a * a + c * c - b * b - d * d,
             2 * (c * d - a * b)],
            [2 * (b * d - a * c), 2 * (c * d + a * b),
             a * a + d * d - b * b - c * c],
        ])
        qfac = hdr.get("qfac", 1.0)
        rot = rot * np.array(pix[:3]) * np.array([1.0, 1.0, qfac])
        aff = np.eye(4)
        aff[:3, :3] = rot
        aff[:3, 3] = (ox, oy, oz)
        return aff
    return np.diag(pix[:3] + [1.0])


def _io_orientation(affine: np.ndarray):
    """For each on-disk data axis: (dominant world axis, sign) —
    nibabel.io_orientation equivalent for non-degenerate affines."""
    rot = affine[:3, :3].copy()
    ornt = []
    used = set()
    for j in range(3):
        col = rot[:, j].copy()
        for u in used:
            col[u] = 0.0
        idx = int(np.argmax(np.abs(col)))
        used.add(idx)
        ornt.append((idx, 1.0 if col[idx] >= 0 else -1.0))
    return ornt


class NibabelIOWithReorient(NiftiIO):
    """Reorients to closest-canonical (RAS) on read and restores the
    original orientation on write (reference nibabel_reader_writer.py:
    NibabelIOWithReorient, used by the AMOS/KiTS converters)."""

    def read_images(self, image_fnames):
        images, spacings, props0 = [], [], None
        for f in image_fnames:
            data, hdr = read_nifti(f)
            assert data.ndim == 3, (
                f"NibabelIOWithReorient supports 3D only, got {data.shape}")
            affine = _affine_from_header(hdr)
            ornt = _io_orientation(affine)
            flip_axes = tuple(j for j, (_, sgn) in enumerate(ornt)
                              if sgn < 0)
            perm = tuple(
                next(j for j, (w, _) in enumerate(ornt) if w == k)
                for k in range(3))
            ras = data
            if flip_axes:
                ras = np.flip(ras, axis=flip_axes)
            ras = ras.transpose(perm)
            voxsize = np.sqrt((affine[:3, :3] ** 2).sum(axis=0))
            spacing_ras = tuple(float(voxsize[list(perm)[i]])
                                for i in range(3))
            images.append(ras.transpose(2, 1, 0)[None].astype(np.float32))
            spacings.append(tuple(spacing_ras[::-1]))
            if props0 is None:
                props0 = {"nifti_header": hdr,
                          "reorient_perm": perm,
                          "reorient_flips": flip_axes}
        if not self._check_all_same([i.shape for i in images]):
            raise RuntimeError(f"image shapes differ: {image_fnames}")
        if not self._check_all_same(spacings):
            raise RuntimeError(f"image spacings differ: {image_fnames}")
        props0["spacing"] = spacings[0]
        return np.vstack(images), props0

    def write_seg(self, seg: np.ndarray, output_fname: str, properties: dict
                  ) -> None:
        assert seg.ndim == 3
        ras = seg.transpose(2, 1, 0)  # (z,y,x) index -> RAS (x,y,z)
        perm = properties.get("reorient_perm", (0, 1, 2))
        flips = properties.get("reorient_flips", ())
        inv_perm = tuple(int(np.argsort(perm)[i]) for i in range(3))
        orig = ras.transpose(inv_perm)
        if flips:
            orig = np.flip(orig, axis=tuple(flips))
        hdr = properties.get("nifti_header")
        spacing_xyz = (tuple(hdr["pixdim"][:3]) if hdr is not None
                       else tuple(properties["spacing"][::-1]))
        write_nifti(output_fname, orig.astype(np.uint8, copy=False),
                    spacing_xyz, hdr)
