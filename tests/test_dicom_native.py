"""Native C++ DICOM reader: round-trip against hand-written DICOM bytes.

No pydicom exists in this environment, so the fixtures write DICOM Part 10
byte streams directly (explicit and implicit VR little endian) — which also
pins the wire format the parser must accept.
"""

import struct

import numpy as np
import pytest

from montecarlo_gated_mil_tpu.data.dicom_native import (
    make_native_dicom_reader,
    read_dicom_native,
)


def _el_explicit(group, elem, vr, value: bytes) -> bytes:
    if len(value) % 2:
        value += b"\x00" if vr in (b"OB", b"UI") else b" "
    head = struct.pack("<HH", group, elem) + vr
    if vr in (b"OB", b"OW", b"OF", b"SQ", b"UT", b"UN"):
        return head + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return head + struct.pack("<H", len(value)) + value


def _el_implicit(group, elem, value: bytes) -> bytes:
    if len(value) % 2:
        value += b" "
    return struct.pack("<HHI", group, elem, len(value)) + value


def _write_dicom(path, rows, cols, bits_stored, pixels: np.ndarray,
                 explicit=True, patient_id=b"PAT123", age=b"042Y",
                 laterality=b"R", preamble=True):
    out = b"\x00" * 128 + b"DICM" if preamble else b""
    # minimal file meta (always explicit VR)
    out += _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.1")
    el = _el_explicit if explicit else _el_implicit
    mk = (lambda g, e, vr, v: el(g, e, vr, v)) if explicit else (
        lambda g, e, vr, v: el(g, e, v)
    )
    out += mk(0x0010, 0x0020, b"LO", patient_id)
    out += mk(0x0010, 0x1010, b"AS", age)
    out += mk(0x0020, 0x0062, b"CS", laterality)
    out += mk(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    out += mk(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    out += mk(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    out += mk(0x0028, 0x0101, b"US", struct.pack("<H", bits_stored))
    out += mk(0x0028, 0x0103, b"US", struct.pack("<H", 0))
    px = pixels.astype("<u2").tobytes()
    if explicit:
        out += _el_explicit(0x7FE0, 0x0010, b"OW", px)
    else:
        out += _el_implicit(0x7FE0, 0x0010, px)
    with open(path, "wb") as f:
        f.write(out)


@pytest.mark.parametrize("explicit", [True, False])
def test_roundtrip(tmp_path, explicit):
    rng = np.random.default_rng(0)
    rows, cols, bits = 12, 10, 12
    px = rng.integers(0, 2**bits, size=(rows, cols), dtype=np.uint16)
    p = tmp_path / f"img_{explicit}.dcm"
    _write_dicom(p, rows, cols, bits, px, explicit=explicit)
    img, meta = read_dicom_native(p)
    assert img.shape == (rows, cols) and img.dtype == np.float32
    np.testing.assert_allclose(img, px / (2**bits - 1), atol=1e-7)
    assert meta.patient_id == "PAT123"
    assert meta.age == 42
    assert meta.laterality == "R"


def test_reader_normalization_matches_reference_formula(tmp_path):
    """Max pixel at BitsStored depth maps exactly to 1.0 (dataset.py:176-180)."""
    px = np.array([[0, 1023], [512, 256]], dtype=np.uint16)
    p = tmp_path / "n.dcm"
    _write_dicom(p, 2, 2, 10, px)
    img, _ = read_dicom_native(p)
    assert img.max() == 1.0 and img.min() == 0.0


def test_error_paths(tmp_path):
    p = tmp_path / "garbage.dcm"
    p.write_bytes(b"\x00" * 200)
    with pytest.raises(ValueError, match="native DICOM parse failed"):
        read_dicom_native(p)
    with pytest.raises(ValueError):
        read_dicom_native(tmp_path / "missing.dcm")
    # missing PixelData
    q = tmp_path / "nopx.dcm"
    out = b"\x00" * 128 + b"DICM"
    out += _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", 2))
    q.write_bytes(out)
    with pytest.raises(ValueError):
        read_dicom_native(q)


def test_bag_loader_reader(tmp_path):
    """Native reader plugs into BagLoader CC/MLO pairing."""
    from montecarlo_gated_mil_tpu.data.records import BagRecord

    px_cc = np.full((8, 8), 100, np.uint16)
    px_mlo = np.full((8, 8), 900, np.uint16)
    _write_dicom(tmp_path / "p_L_CC.dcm", 8, 8, 10, px_cc)
    _write_dicom(tmp_path / "p_L_MLO.dcm", 8, 8, 10, px_mlo)
    reader = make_native_dicom_reader()
    rec = BagRecord(
        paths=(str(tmp_path / "p_L_CC.dcm"), str(tmp_path / "p_L_MLO.dcm")),
        class_name="Benign",
        view="Left",
        laterality="L",
    )
    out = reader(rec)
    cc, mlo = out.images
    np.testing.assert_allclose(cc, 100 / 1023, atol=1e-7)
    np.testing.assert_allclose(mlo, 900 / 1023, atol=1e-7)
    # metadata from the MLO file (reference returns the last-read dcm,
    # dataset.py:93-103)
    assert out.meta.patient_id == "PAT123" and out.meta.age == 42


def test_dicom_metadata_lands_in_records(tmp_path):
    """End-to-end: BagLoader yields records enriched with the DICOM header's
    patient_id/age, and the ImageLaterality tag supersedes the table
    laterality (reference dataset.py:51-64)."""
    import jax.numpy as jnp

    from montecarlo_gated_mil_tpu.data.pipeline import BagLoader, PipelineConfig
    from montecarlo_gated_mil_tpu.data.records import BagRecord

    rng = np.random.default_rng(1)
    px = rng.integers(200, 1023, size=(64, 64), dtype=np.uint16)
    p = tmp_path / "u_R_CC.dcm"
    # table says L, the file's tag says R -> tag wins
    _write_dicom(p, 64, 64, 10, px, patient_id=b"PATX", age=b"057Y",
                 laterality=b"R")
    rec = BagRecord(paths=(str(p),), class_name="Malignant", view="RCC",
                    laterality="L")
    cfg = PipelineConfig(height=64, width=64, patch_size=32, overlap=0.0,
                         empty_threshold=0.05, bucket=8)
    loader = BagLoader([rec], make_native_dicom_reader(), cfg)
    (bag, out_rec), = list(loader.epoch(0))
    assert out_rec.patient_id == "PATX"
    assert out_rec.age == 57
    assert out_rec.laterality == "R"
    # laterality flip applied: bag differs from the unflipped pipeline
    loader_l = BagLoader(
        [BagRecord(paths=(str(p),), class_name="Malignant", view="RCC",
                   laterality="L")],
        lambda r: (px / 1023.0).astype(np.float32), cfg,
    )
    (bag_l, _), = list(loader_l.epoch(0))
    assert not jnp.allclose(bag.patches, bag_l.patches)
