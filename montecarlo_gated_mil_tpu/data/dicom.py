"""DICOM reading (gated on pydicom availability).

Capability spec: ``/root/reference/dataset.py:82-112,162-180`` — pixel
normalization by ``2^BitsStored - 1``, CC/MLO pairing by filename tags,
PatientID / age ('dddY') / ImageLaterality metadata extraction.  Unlike the
reference, paths are absolute (no ``os.chdir`` per item — the global-CWD
hack called out in SURVEY.md §2).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from montecarlo_gated_mil_tpu.data.records import BagRecord

try:  # pydicom is optional in this environment
    from pydicom import dcmread

    HAVE_PYDICOM = True
except ImportError:  # pragma: no cover - exercised only without pydicom
    dcmread = None
    HAVE_PYDICOM = False


@dataclass(frozen=True)
class DicomMeta:
    patient_id: str
    age: int
    laterality: str


def normalize_dicom_pixels(pixel_array: np.ndarray, bits_stored: int) -> np.ndarray:
    """Dynamic-range normalization by the actual stored bit depth
    (reference ``__normalize_dicom``, ``dataset.py:176-180``)."""
    max_val = (2**bits_stored) - 1
    return np.asarray(pixel_array, np.float32) / np.float32(max_val)


def parse_age(age_str: str) -> int:
    """'dddY'-style DICOM age strings -> years (reference ``dataset.py:162-167``)."""
    idx = age_str.find("Y")
    if idx < 0:
        raise ValueError(f"unparseable DICOM age {age_str!r}")
    return int(age_str[max(0, idx - 3) : idx])


def _require_pydicom():
    if not HAVE_PYDICOM:
        raise ImportError(
            "pydicom is not installed; use the synthetic reader "
            "(montecarlo_gated_mil_tpu.data.synthetic) or install pydicom"
        )


def read_dicom(path: str | os.PathLike) -> tuple[np.ndarray, DicomMeta]:
    """One DICOM -> (normalized grayscale [0,1], metadata)."""
    _require_pydicom()
    dcm = dcmread(path)
    img = normalize_dicom_pixels(dcm.pixel_array, int(dcm.BitsStored))
    meta = DicomMeta(
        patient_id=str(getattr(dcm, "PatientID", "")),
        age=parse_age(str(dcm[(0x0010, 0x1010)].value)) if (0x0010, 0x1010) in dcm else -1,
        laterality=str(getattr(dcm, "ImageLaterality", "")),
    )
    return img, meta


def split_cc_mlo(paths: tuple[str, ...]) -> tuple[str, str]:
    """Find the (CC, MLO) pair by filename tags (reference ``dataset.py:83-92``)."""
    cc = mlo = None
    for p in paths:
        name = os.path.basename(p)
        if "CC" in name:
            cc = p
        if "ML" in name or "MO" in name:
            mlo = p
    if cc is None or mlo is None:
        raise ValueError(f"CC or MLO not found among {paths}")
    return cc, mlo


def make_dicom_reader(root: str = ""):
    """Reader for :class:`BagLoader`: yields :class:`PixelData` so patient
    metadata rides along with the pixels.  Multimodal metadata comes from the
    MLO file (the reference returns the last-read dcm, ``dataset.py:93-103``)."""
    from montecarlo_gated_mil_tpu.data.records import PixelData

    _require_pydicom()

    def read(rec: BagRecord):
        paths = tuple(
            os.path.join(root, rec.class_name, p) if root else p for p in rec.paths
        )
        if len(paths) == 1:
            img, meta = read_dicom(paths[0])
            return PixelData((img,), meta)
        cc_path, mlo_path = split_cc_mlo(paths)
        cc, _ = read_dicom(cc_path)
        mlo, meta = read_dicom(mlo_path)
        return PixelData((cc, mlo), meta)

    return read
