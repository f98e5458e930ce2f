"""ctypes binding to the native C++ DICOM reader (native/dicom.cc).

The image has no pydicom; this native reader supplies the DICOM capability
the reference gets from pydicom (``/root/reference/dataset.py:93-112,
162-180``): uncompressed Explicit/Implicit VR Little Endian pixel data plus
the compressed transfer syntaxes clinical mammography archives emit —
RLE Lossless (1.2.840.10008.1.2.5 — PackBits byte planes, PS3.5 Annex G),
JPEG Lossless process 14 (1.2.840.10008.1.2.4.57/.70 — ISO 10918-1
SOF3 Huffman predictive coding, any predictor 1-7, point transform,
restart intervals, grayscale), lossy JPEG sequential DCT
(1.2.840.10008.1.2.4.50 Baseline / .51 Extended — ISO 10918-1 SOF0/SOF1,
8/12-bit, restart intervals, grayscale) and JPEG-LS
(1.2.840.10008.1.2.4.80 lossless / .81 near-lossless — ITU-T T.87 LOCO-I
with run mode and LSE preset parameters, grayscale), JPEG 2000 Part 1
(1.2.840.10008.1.2.4.90/.91 — ISO 15444-1 / ITU-T T.800 reversible 5/3,
raw codestreams and JP2-wrapped, tiles, all progression orders, quality
layers, grayscale) — plus Deflated Explicit VR Little Endian
(1.2.840.10008.1.2.1.99, raw-deflate dataset via zlib) and the
PatientID / PatientAge / ImageLaterality / BitsStored fields, normalized
by ``2^BitsStored - 1`` exactly as the reference.  Remaining compressed
syntaxes (HTJ2K, progressive JPEG, irreversible 9/7 J2K) raise with the
offending TransferSyntaxUID, SOF, or wavelet named, so the gap vs
pydicom's decoder coverage is diagnosable rather than silent.

The shared library builds lazily with g++ on first use and is cached next to
the source.  ``read_dicom_native`` mirrors ``data.dicom.read_dicom``'s return
contract so either backend can serve the :class:`BagLoader` reader.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from montecarlo_gated_mil_tpu.data.dicom import DicomMeta, parse_age

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_NAME = "libmcgmil_dicom.so"
_lock = threading.Lock()
_lib = None


class _DicomResult(ctypes.Structure):
    _fields_ = [
        ("pixels", ctypes.POINTER(ctypes.c_uint8)),
        ("pixel_bytes", ctypes.c_uint64),
        ("rows", ctypes.c_uint32),
        ("cols", ctypes.c_uint32),
        ("bits_allocated", ctypes.c_uint32),
        ("bits_stored", ctypes.c_uint32),
        ("pixel_representation", ctypes.c_uint32),
        ("patient_id", ctypes.c_char * 65),
        ("patient_age", ctypes.c_char * 17),
        ("laterality", ctypes.c_char * 17),
        ("transfer_syntax", ctypes.c_char * 65),
        ("error", ctypes.c_char * 256),
    ]


def _build_library(src: str, out: str) -> None:
    subprocess.run(
        # -lz: raw-deflate inflate for the Deflated Explicit VR Little
        # Endian transfer syntax (1.2.840.10008.1.2.1.99, PS3.5 A.5).
        ["g++", "-O2", "-shared", "-fPIC", "-o", out, src, "-lz"],
        check=True,
        capture_output=True,
        text=True,
    )


def load_library() -> ctypes.CDLL:
    """Load (building if needed) the native reader."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        native_dir = os.path.abspath(_NATIVE_DIR)
        so_path = os.path.join(native_dir, _SO_NAME)
        src_path = os.path.join(native_dir, "dicom.cc")
        if not os.path.exists(so_path) or (
            os.path.exists(src_path)
            and os.path.getmtime(src_path) > os.path.getmtime(so_path)
        ):
            if not os.path.exists(src_path):
                raise FileNotFoundError(f"native source missing: {src_path}")
            _build_library(src_path, so_path)
        lib = ctypes.CDLL(so_path)
        lib.mcgmil_dicom_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(_DicomResult),
        ]
        lib.mcgmil_dicom_read.restype = ctypes.c_int
        lib.mcgmil_dicom_free.argtypes = [ctypes.POINTER(_DicomResult)]
        lib.mcgmil_dicom_free.restype = None
        _lib = lib
        return lib


def read_dicom_native(path: str | os.PathLike) -> tuple[np.ndarray, DicomMeta]:
    """One DICOM file -> (normalized grayscale [0,1] float32, metadata)."""
    lib = load_library()
    res = _DicomResult()
    rc = lib.mcgmil_dicom_read(str(path).encode(), ctypes.byref(res))
    if rc != 0:
        raise ValueError(
            f"native DICOM parse failed ({rc}): {res.error.decode(errors='replace')}"
        )
    try:
        rows, cols = int(res.rows), int(res.cols)
        if res.bits_allocated == 8:
            dtype = np.uint8
        elif res.pixel_representation:
            dtype = np.int16
        else:
            dtype = np.uint16
        count = rows * cols
        raw = np.ctypeslib.as_array(res.pixels, shape=(int(res.pixel_bytes),))
        px = raw[: count * np.dtype(dtype).itemsize].view(dtype).reshape(rows, cols)
        max_val = (2 ** int(res.bits_stored)) - 1
        img = px.astype(np.float32) / np.float32(max_val)
        img = np.array(img)  # detach from the soon-to-be-freed buffer
        age_s = res.patient_age.decode(errors="replace")
        meta = DicomMeta(
            patient_id=res.patient_id.decode(errors="replace"),
            age=parse_age(age_s) if "Y" in age_s else -1,
            laterality=res.laterality.decode(errors="replace"),
        )
        return img, meta
    finally:
        lib.mcgmil_dicom_free(ctypes.byref(res))


def make_native_dicom_reader(root: str = ""):
    """BagLoader reader over the native parser (CC/MLO pairing as in
    ``data.dicom.make_dicom_reader``); yields :class:`PixelData` so patient
    metadata rides along.  Multimodal metadata comes from the MLO file (the
    reference returns the last-read dcm, ``dataset.py:93-103``)."""
    from montecarlo_gated_mil_tpu.data.dicom import split_cc_mlo
    from montecarlo_gated_mil_tpu.data.records import BagRecord, PixelData

    def read(rec: BagRecord):
        paths = tuple(
            os.path.join(root, rec.class_name, p) if root else p for p in rec.paths
        )
        if len(paths) == 1:
            img, meta = read_dicom_native(paths[0])
            return PixelData((img,), meta)
        cc_path, mlo_path = split_cc_mlo(paths)
        cc, _ = read_dicom_native(cc_path)
        mlo, meta = read_dicom_native(mlo_path)
        return PixelData((cc, mlo), meta)

    return read
