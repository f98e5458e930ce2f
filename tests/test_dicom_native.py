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


def _packbits(data: bytes) -> bytes:
    """PackBits encode (PS3.5 Annex G.3.1): replicate runs >= 2, else
    literal chunks of <= 128 bytes."""
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
        else:
            j = i + 1
            while (
                j < len(data)
                and (j - i) < 128
                and not (j + 1 < len(data) and data[j] == data[j + 1])
            ):
                j += 1
            out.append(j - i - 1)
            out.extend(data[i:j])
            i = j
    return bytes(out)


def _item(data: bytes) -> bytes:
    return struct.pack("<HHI", 0xFFFE, 0xE000, len(data)) + data


def _write_encapsulated(path, rows, cols, bits_stored, syntax_uid: bytes,
                        frame: bytes | None, bits_alloc: int = 16):
    """Part 10 file with encapsulated PixelData under `syntax_uid`."""
    out = b"\x00" * 128 + b"DICM"
    out += _el_explicit(0x0002, 0x0010, b"UI", syntax_uid)
    out += _el_explicit(0x0010, 0x0020, b"LO", b"PATRLE")
    out += _el_explicit(0x0010, 0x1010, b"AS", b"042Y")
    out += _el_explicit(0x0020, 0x0062, b"CS", b"R")
    out += _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    out += _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    out += _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", bits_alloc))
    out += _el_explicit(0x0028, 0x0101, b"US", struct.pack("<H", bits_stored))
    out += _el_explicit(0x0028, 0x0103, b"US", struct.pack("<H", 0))
    out += struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00"
    out += struct.pack("<I", 0xFFFFFFFF)
    out += _item(b"")  # empty Basic Offset Table
    if frame is not None:
        out += _item(frame)
    out += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)  # sequence delimiter
    with open(path, "wb") as f:
        f.write(out)


def _rle_frame(px: np.ndarray) -> bytes:
    """One RLE frame (PS3.5 Annex G): 64-byte header + per-byte-plane
    PackBits segments, segment 0 = most significant byte."""
    flat = px.astype(">u2").tobytes()  # big-endian -> plane split is easy
    msb = _packbits(flat[0::2])
    lsb = _packbits(flat[1::2])
    if len(msb) % 2:
        msb += b"\x00"
    if len(lsb) % 2:
        lsb += b"\x00"
    offsets = [64, 64 + len(msb)] + [0] * 13
    header = struct.pack("<16I", 2, *offsets)
    return header + msb + lsb


def test_rle_lossless_roundtrip(tmp_path):
    """RLE Lossless (1.2.840.10008.1.2.5) decodes bit-exact: replicate runs
    (the constant border) AND literal runs (the random center) both hit."""
    rng = np.random.default_rng(3)
    rows, cols, bits = 16, 12, 12
    px = np.zeros((rows, cols), dtype=np.uint16)  # constant -> replicate
    px[4:12, 3:9] = rng.integers(  # random -> literal runs
        0, 2**bits, size=(8, 6), dtype=np.uint16
    )
    p = tmp_path / "rle.dcm"
    _write_encapsulated(p, rows, cols, bits, b"1.2.840.10008.1.2.5",
                        _rle_frame(px))
    img, meta = read_dicom_native(p)
    np.testing.assert_allclose(img, px / (2**bits - 1), atol=1e-7)
    assert meta.patient_id == "PATRLE" and meta.laterality == "R"


def test_unsupported_syntax_error_names_the_uid(tmp_path):
    """An HTJ2K file fails NAMING the TransferSyntaxUID (VERDICT r03
    Missing #2: the error must say which syntax, matching the diagnosability
    pydicom gives the reference at dataset.py:93-112)."""
    p = tmp_path / "htj2k.dcm"
    _write_encapsulated(p, 4, 4, 12, b"1.2.840.10008.1.2.4.201", b"\x00" * 64)
    with pytest.raises(ValueError) as ei:
        read_dicom_native(p)
    assert "1.2.840.10008.1.2.4.201" in str(ei.value)
    assert "HTJ2K" in str(ei.value)


def _write_deflated(path, rows, cols, bits_stored, px: np.ndarray):
    """Part 10 file in Deflated Explicit VR LE (1.2.840.10008.1.2.1.99,
    PS3.5 A.5): the main dataset is one RAW deflate stream (no zlib
    header) after the uncompressed meta group."""
    import zlib

    body = _el_explicit(0x0010, 0x0020, b"LO", b"PATDEF")
    body += _el_explicit(0x0020, 0x0062, b"CS", b"L")
    body += _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    body += _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    body += _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    body += _el_explicit(0x0028, 0x0101, b"US", struct.pack("<H", bits_stored))
    body += _el_explicit(0x7FE0, 0x0010, b"OW", px.astype("<u2").tobytes())
    z = zlib.compressobj(9, zlib.DEFLATED, -15)  # raw deflate
    out = b"\x00" * 128 + b"DICM"
    out += _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.1.99")
    out += z.compress(body) + z.flush()
    with open(path, "wb") as f:
        f.write(out)


def test_deflated_dataset_roundtrip(tmp_path):
    """Deflated Explicit VR LE inflates and parses like a plain dataset."""
    rng = np.random.default_rng(11)
    rows, cols, bits = 10, 14, 12
    px = rng.integers(0, 2**bits, size=(rows, cols), dtype=np.uint16)
    p = tmp_path / "deflated.dcm"
    _write_deflated(p, rows, cols, bits, px)
    img, meta = read_dicom_native(p)
    np.testing.assert_allclose(img, px / (2**bits - 1), atol=1e-7)
    assert meta.patient_id == "PATDEF" and meta.laterality == "L"


def test_deflated_garbage_errors_loudly(tmp_path):
    """A corrupt deflate stream errors naming the syntax, not on garbage
    element values."""
    out = b"\x00" * 128 + b"DICM"
    out += _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.1.99")
    out += b"\xfe\xed" + b"\x00" * 64  # not a deflate stream
    p = tmp_path / "deflate_bad.dcm"
    p.write_bytes(out)
    with pytest.raises(ValueError, match="1.2.840.10008.1.2.1.99"):
        read_dicom_native(p)


def test_big_endian_error_names_the_uid(tmp_path):
    """Explicit VR Big Endian re-encodes every element; the parser refuses
    with the UID named instead of failing on byte-swapped values."""
    out = b"\x00" * 128 + b"DICM"
    out += _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.2")
    out += _el_explicit(0x0028, 0x0010, b"US", struct.pack(">H", 4))
    p = tmp_path / "bigendian.dcm"
    p.write_bytes(out)
    with pytest.raises(ValueError, match="1.2.840.10008.1.2.2"):
        read_dicom_native(p)


def test_truncated_rle_segment_errors(tmp_path):
    """An RLE frame whose segment decodes short of Rows*Cols errors loudly
    instead of returning a partial image."""
    px = np.arange(16, dtype=np.uint16).reshape(4, 4)
    frame = bytearray(_rle_frame(px))
    frame = bytes(frame[:-4])  # chop the tail of the LSB segment
    p = tmp_path / "short.dcm"
    _write_encapsulated(p, 4, 4, 12, b"1.2.840.10008.1.2.5", frame)
    with pytest.raises(ValueError, match="RLE segment"):
        read_dicom_native(p)


# --- JPEG Lossless (process 14) fixtures: a reference encoder written from
# ISO 10918-1 (SOF3 Huffman predictive coding), so the native decoder is
# pinned against independently produced streams, not against itself. -------

# Canonical Huffman table covering every SSSS category 0..16 (Kraft-exact).
_JPLL_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0]
_JPLL_VALUES = list(range(17))


def _jpll_codes():
    """Canonical (code, length) per symbol — the decoder's own convention."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(_JPLL_COUNTS[length - 1]):
            codes[_JPLL_VALUES[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _jpeg_lossless_frame(px, bits, predictor=1, pt=0, restart=0):
    """Encode a grayscale array as an ISO 10918-1 process-14 stream."""
    rows, cols = px.shape
    codes = _jpll_codes()
    w = _BitWriter()
    x = (px.astype(np.int64) >> pt)
    recon = np.zeros((rows, cols), np.int64)
    default = 1 << (bits - pt - 1)
    since, rst = 0, 0
    fresh = True
    first_row = 0  # first line of the current restart interval: 1-D Ra
    for y in range(rows):
        for xx in range(cols):
            if restart and since == restart:
                w.align()
                w.out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                since = 0
                fresh = True
                first_row = y
            if fresh:
                pred = default
                fresh = False
            elif y == first_row:
                pred = recon[y, xx - 1]
            elif xx == 0:
                pred = recon[y - 1, 0]
            else:
                ra, rb, rc = recon[y, xx - 1], recon[y - 1, xx], recon[y - 1, xx - 1]
                pred = {
                    1: ra, 2: rb, 3: rc, 4: ra + rb - rc,
                    5: ra + ((rb - rc) >> 1), 6: rb + ((ra - rc) >> 1),
                    7: (ra + rb) >> 1,
                }[predictor]
            recon[y, xx] = x[y, xx]
            d = (int(x[y, xx]) - int(pred)) % 65536
            if d > 32768:
                d -= 65536
            if d == 0:
                ssss = 0
            elif d == 32768:
                ssss = 16
            else:
                ssss = abs(d).bit_length()
            c, ln = codes[ssss]
            w.put(c, ln)
            if 0 < ssss < 16:
                v = d if d >= 0 else d + (1 << ssss) - 1
                w.put(v, ssss)
            since += 1
    w.align()
    entropy = bytes(w.out)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dht = seg(0xC4, bytes([0x00]) + bytes(_JPLL_COUNTS) + bytes(_JPLL_VALUES))
    sof = seg(0xC3, struct.pack(">BHHB", bits, rows, cols, 1) + bytes([1, 0x11, 0]))
    dri = seg(0xDD, struct.pack(">H", restart)) if restart else b""
    sos = seg(0xDA, bytes([1, 1, 0x00, predictor, 0, pt]))
    return b"\xff\xd8" + dht + sof + dri + sos + entropy + b"\xff\xd9"


def test_jpeg_lossless_sv1_roundtrip(tmp_path):
    """JPEG Lossless SV1 (1.2.840.10008.1.2.4.70, predictor 1) decodes
    bit-exact — the transfer syntax clinical mammography archives emit."""
    rng = np.random.default_rng(5)
    rows, cols, bits = 16, 12, 12
    px = rng.integers(0, 2**bits, size=(rows, cols), dtype=np.uint16)
    p = tmp_path / "jpll.dcm"
    _write_encapsulated(p, rows, cols, bits, b"1.2.840.10008.1.2.4.70",
                        _jpeg_lossless_frame(px, bits, predictor=1))
    img, meta = read_dicom_native(p)
    np.testing.assert_allclose(img, px / (2**bits - 1), atol=1e-7)
    assert meta.patient_id == "PATRLE" and meta.laterality == "R"


@pytest.mark.parametrize("predictor", [2, 3, 4, 5, 6, 7])
def test_jpeg_lossless_all_predictors(tmp_path, predictor):
    """Process 14 proper (1.2.840.10008.1.2.4.57): every ISO 10918-1
    predictor reconstructs bit-exact."""
    rng = np.random.default_rng(10 + predictor)
    rows, cols, bits = 9, 11, 10
    px = rng.integers(0, 2**bits, size=(rows, cols), dtype=np.uint16)
    p = tmp_path / f"jpll_p{predictor}.dcm"
    _write_encapsulated(p, rows, cols, bits, b"1.2.840.10008.1.2.4.57",
                        _jpeg_lossless_frame(px, bits, predictor=predictor))
    img, _ = read_dicom_native(p)
    np.testing.assert_allclose(img, px / (2**bits - 1), atol=1e-7)


def test_jpeg_lossless_point_transform_and_restarts(tmp_path):
    """Point transform shifts reconstruction ((x >> Pt) << Pt) and restart
    intervals reset the prediction at every RST marker (ISO H.1.2.2)."""
    rng = np.random.default_rng(7)
    rows, cols, bits, pt = 8, 13, 12, 2
    px = rng.integers(0, 2**bits, size=(rows, cols), dtype=np.uint16)
    p = tmp_path / "jpll_ptrst.dcm"
    _write_encapsulated(
        p, rows, cols, bits, b"1.2.840.10008.1.2.4.70",
        _jpeg_lossless_frame(px, bits, predictor=4, pt=pt, restart=7),
    )
    img, _ = read_dicom_native(p)
    want = ((px.astype(np.int64) >> pt) << pt).astype(np.float64)
    np.testing.assert_allclose(img, want / (2**bits - 1), atol=1e-7)


def test_jpeg_lossless_stream_split_across_fragments(tmp_path):
    """A JPEG stream may legally split across encapsulated fragments
    (PS3.5 A.4) — the decoder concatenates before decoding."""
    rng = np.random.default_rng(9)
    rows, cols, bits = 8, 8, 8
    px = rng.integers(0, 2**bits, size=(rows, cols), dtype=np.uint16)
    frame = _jpeg_lossless_frame(px, bits)
    cut = len(frame) // 2
    cut -= cut % 2  # DICOM items carry even byte counts
    a, b = frame[:cut], frame[cut:]
    if len(b) % 2:
        b += b"\x00"  # trailing pad byte; the decoder stops at EOI
    out = b"\x00" * 128 + b"DICM"
    out += _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.4.70")
    out += _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    out += _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    out += _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    out += _el_explicit(0x0028, 0x0101, b"US", struct.pack("<H", bits))
    out += struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00"
    out += struct.pack("<I", 0xFFFFFFFF)
    out += _item(b"") + _item(a) + _item(b)
    out += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    p = tmp_path / "split.dcm"
    p.write_bytes(out)
    img, _ = read_dicom_native(p)
    np.testing.assert_allclose(img, px / (2**bits - 1), atol=1e-7)


def test_jpeg_lossy_sof_rejected(tmp_path):
    """A baseline-DCT (SOF0) stream under a lossless UID errors naming the
    process instead of decoding garbage."""
    frame = bytearray(_jpeg_lossless_frame(
        np.zeros((4, 4), np.uint16), 8))
    i = frame.index(b"\xff\xc3")
    frame[i + 1] = 0xC0  # flip SOF3 -> SOF0
    p = tmp_path / "lossy.dcm"
    _write_encapsulated(p, 4, 4, 8, b"1.2.840.10008.1.2.4.70", bytes(frame))
    with pytest.raises(ValueError, match="not lossless"):
        read_dicom_native(p)


def test_parser_survives_mutation_fuzz(tmp_path):
    """The parser runs IN-PROCESS (ctypes): adversarial or corrupt files
    must raise ValueError, never segfault, hang, or over-read.  Seeded
    byte-flip/truncation fuzz over every supported container format."""
    rng = np.random.default_rng(2024)
    rows, cols, bits = 8, 10, 12
    px = rng.integers(0, 2**bits, size=(rows, cols), dtype=np.uint16)
    seeds = []
    p = tmp_path / "plain.dcm"
    _write_dicom(p, rows, cols, bits, px)
    seeds.append(p.read_bytes())
    p = tmp_path / "rle.dcm"
    _write_encapsulated(p, rows, cols, bits, b"1.2.840.10008.1.2.5",
                        _rle_frame(px))
    seeds.append(p.read_bytes())
    p = tmp_path / "jpll.dcm"
    _write_encapsulated(p, rows, cols, bits, b"1.2.840.10008.1.2.4.70",
                        _jpeg_lossless_frame(px, bits, restart=13))
    seeds.append(p.read_bytes())
    p = tmp_path / "defl.dcm"
    _write_deflated(p, rows, cols, bits, px)
    seeds.append(p.read_bytes())

    target = tmp_path / "fuzz.dcm"
    tried = 0
    for seed_bytes in seeds:
        for trial in range(120):
            data = bytearray(seed_bytes)
            kind = trial % 3
            if kind == 0:  # flip 1-4 random bytes
                for _ in range(rng.integers(1, 5)):
                    data[rng.integers(0, len(data))] = rng.integers(0, 256)
            elif kind == 1:  # truncate
                data = data[: rng.integers(1, len(data))]
            else:  # flip bytes in the tail half (pixel/entropy data)
                for _ in range(rng.integers(1, 9)):
                    data[rng.integers(len(data) // 2, len(data))] = (
                        rng.integers(0, 256)
                    )
            target.write_bytes(bytes(data))
            try:
                img, _ = read_dicom_native(target)
                assert img.shape[0] >= 1  # survived with a parseable result
            except ValueError:
                pass  # rejected loudly: the contract
            tried += 1
    assert tried == 480


def test_oversubscribed_dht_rejected(tmp_path):
    """An oversubscribed Huffman table (3 codes of length 1) must fail
    BEFORE any decode-LUT fill — the fill indexes by canonical code, so an
    invalid table used to write far out of bounds (review finding)."""
    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    counts = [3] + [0] * 15  # 3 length-1 codes: impossible
    dht = seg(0xC4, bytes([0x00]) + bytes(counts) + bytes([0, 1, 2]))
    sof = seg(0xC3, struct.pack(">BHHB", 8, 4, 4, 1) + bytes([1, 0x11, 0]))
    sos = seg(0xDA, bytes([1, 1, 0x00, 1, 0, 0]))
    frame = b"\xff\xd8" + dht + sof + sos + b"\x00" * 8 + b"\xff\xd9"
    p = tmp_path / "oversub.dcm"
    _write_encapsulated(p, 4, 4, 8, b"1.2.840.10008.1.2.4.70", frame)
    with pytest.raises(ValueError, match="Huffman"):
        read_dicom_native(p)
    # SSSS symbols above 16 are equally invalid (would drive UB shifts)
    counts = [0, 1] + [0] * 14
    dht = seg(0xC4, bytes([0x00]) + bytes(counts) + bytes([0x20]))
    frame = b"\xff\xd8" + dht + sof + sos + b"\x00" * 8 + b"\xff\xd9"
    p = tmp_path / "bigssss.dcm"
    _write_encapsulated(p, 4, 4, 8, b"1.2.840.10008.1.2.4.70", frame)
    with pytest.raises(ValueError, match="Huffman"):
        read_dicom_native(p)


def test_jpeg_fill_bytes_before_restart_markers(tmp_path):
    """Optional 0xFF fill bytes may precede any marker (ISO B.1.1.2):
    padding before RSTn must not abort the decode."""
    rng = np.random.default_rng(21)
    rows, cols, bits = 8, 13, 12
    px = rng.integers(0, 2**bits, size=(rows, cols), dtype=np.uint16)
    frame = _jpeg_lossless_frame(px, bits, predictor=2, restart=7)
    for m in range(8):  # pad every restart marker with an extra fill byte
        frame = frame.replace(bytes([0xFF, 0xD0 + m]), bytes([0xFF, 0xFF, 0xD0 + m]))
    p = tmp_path / "fillrst.dcm"
    _write_encapsulated(p, rows, cols, bits, b"1.2.840.10008.1.2.4.70", frame)
    img, _ = read_dicom_native(p)
    np.testing.assert_allclose(img, px / (2**bits - 1), atol=1e-7)


# ---------------------------------------------------------------------------
# JPEG-LS (ITU-T T.87; 1.2.840.10008.1.2.4.80/.81).  The fixture below is an
# INDEPENDENT encoder implementing the same public spec the C++ decoder
# implements (native/dicom.cc::jls_decode_scan) — written in a different
# language from the spec text, so a shared misreading has to happen twice
# to round-trip.

_JLS_J = [0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
          4, 4, 5, 5, 6, 6, 7, 7, 8, 9, 10, 11, 12, 13, 14, 15]


class _JlsBitWriter:
    """MSB-first with T.87 A.1 stuffing: after an 0xFF byte the next byte
    carries only SEVEN bits (its MSB is a stuffed 0)."""

    def __init__(self):
        self.out = bytearray()
        self.bits = []

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.bits.append((value >> i) & 1)
        self._drain(False)

    def _drain(self, flush):
        while True:
            width = 7 if (self.out and self.out[-1] == 0xFF) else 8
            if len(self.bits) < width:
                if not (flush and self.bits):
                    return
                chunk = self.bits + [0] * (width - len(self.bits))
                self.bits = []
            else:
                chunk, self.bits = self.bits[:width], self.bits[width:]
            v = 0
            for b in chunk:
                v = (v << 1) | b
            self.out.append(v)

    def flush(self):
        self._drain(True)


def _jls_thresholds(maxval, near):
    """Default T1/T2/T3 (T.87 C.2.4.1.1.1), incl. the spec's CLAMP_i that
    wraps above-MAXVAL values to the LOWER bound."""
    def clamp(i, lo):
        return lo if (i > maxval or i < lo) else i

    if maxval >= 128:
        f = (min(maxval, 4095) + 128) // 256
        return (clamp(f + 2 + 3 * near, near + 1),
                clamp(4 * f + 3 + 5 * near, near + 2),
                clamp(17 * f + 4 + 7 * near, near + 3))
    f = 256 // (maxval + 1)
    return (clamp(max(2, 3 // f + 3 * near), near + 1),
            clamp(max(3, 7 // f + 5 * near), near + 2),
            clamp(max(4, 21 // f + 7 * near), near + 3))


def _jls_golomb(w, val, k, limit, qbpp):
    """Limited-length Golomb-Rice (T.87 A.5.3)."""
    u = val >> k
    if u < limit - qbpp - 1:
        w.put(1, u + 1)  # u zeros then a 1
        if k:
            w.put(val & ((1 << k) - 1), k)
    else:
        w.put(1, limit - qbpp)  # limit-qbpp-1 zeros then a 1
        w.put(val - 1, qbpp)


def _jls_frame(px, precision, near=0, maxval=None, thresholds=None, reset=64):
    """Encode a grayscale array as a T.87 JPEG-LS stream (LOCO-I: context
    modeling + bias cancellation + Golomb coding + run mode)."""
    rows, cols = px.shape
    emit_lse = maxval is not None or thresholds is not None or reset != 64
    mv = maxval if maxval is not None else (1 << precision) - 1
    t1, t2, t3 = thresholds if thresholds else _jls_thresholds(mv, near)
    step = 2 * near + 1
    rng_ = (mv + 2 * near) // step + 1
    wrap = rng_ * step
    qbpp = max(1, (rng_ - 1).bit_length())
    bpp = max(2, mv.bit_length())
    limit = 2 * (bpp + max(8, bpp))
    A = [max(2, (rng_ + 32) // 64)] * 367
    B = [0] * 365
    Cb = [0] * 365
    N = [1] * 367
    Nn = [0, 0]
    run_index = 0
    w = _JlsBitWriter()
    src = px.astype(np.int64)

    def quant(d):
        if d <= -t3:
            return -4
        if d <= -t2:
            return -3
        if d <= -t1:
            return -2
        if d < -near:
            return -1
        if d <= near:
            return 0
        if d < t1:
            return 1
        if d < t2:
            return 2
        if d < t3:
            return 3
        return 4

    def modrange(e):
        if e < 0:
            e += rng_
        if e >= (rng_ + 1) // 2:
            e -= rng_
        return e

    prev = [0] * (cols + 2)
    cur = [0] * (cols + 2)
    for y in range(rows):
        cur[0] = prev[1]
        prev[cols + 1] = prev[cols]
        x = 0
        while x < cols:
            ra, rb, rc, rd = cur[x], prev[x + 1], prev[x], prev[x + 2]
            q1, q2, q3 = quant(rd - rb), quant(rb - rc), quant(rc - ra)
            if q1 == q2 == q3 == 0:
                # Run mode (A.7): samples within NEAR of Ra reconstruct AS Ra.
                runcnt = 0
                while (x + runcnt < cols
                       and abs(int(src[y, x + runcnt]) - ra) <= near):
                    cur[x + 1 + runcnt] = ra
                    runcnt += 1
                x += runcnt
                while runcnt >= (1 << _JLS_J[run_index]):
                    w.put(1, 1)
                    runcnt -= 1 << _JLS_J[run_index]
                    if run_index < 31:
                        run_index += 1
                if x >= cols:
                    if runcnt > 0:
                        w.put(1, 1)  # partial segment ending the line
                    continue
                w.put(0, 1)
                if _JLS_J[run_index]:
                    w.put(runcnt, _JLS_J[run_index])
                # Run interruption sample (A.7.2).
                ix = int(src[y, x])
                rb2 = prev[x + 1]
                ritype = 1 if abs(ra - rb2) <= near else 0
                pxp = ra if ritype else rb2
                errval = ix - pxp
                flip = ritype == 0 and ra > rb2
                if flip:
                    errval = -errval
                if near > 0:
                    if errval > 0:
                        errval = (near + errval) // step
                    else:
                        errval = -((near - errval) // step)
                    rx = pxp + (-errval if flip else errval) * step
                    if rx < -near:
                        rx += wrap
                    elif rx > mv + near:
                        rx -= wrap
                    rx = min(max(rx, 0), mv)
                else:
                    rx = ix
                errval = modrange(errval)
                ctx = 365 + ritype
                temp = A[ctx] + (N[ctx] >> 1 if ritype else 0)
                k = 0
                while (N[ctx] << k) < temp:
                    k += 1
                cond = k == 0 and 2 * Nn[ritype] < N[ctx]
                if errval == 0:
                    m = 0
                elif errval > 0:
                    m = 1 if cond else 0
                else:
                    m = 0 if cond else 1
                em = 2 * abs(errval) - ritype - m
                _jls_golomb(w, em, k, limit - _JLS_J[run_index] - 1, qbpp)
                if errval < 0:
                    Nn[ritype] += 1
                A[ctx] += (em + 1 - ritype) >> 1
                if N[ctx] == reset:
                    A[ctx] >>= 1
                    N[ctx] >>= 1
                    Nn[ritype] >>= 1
                N[ctx] += 1
                cur[x + 1] = rx
                x += 1
                if run_index > 0:
                    run_index -= 1
                continue
            # Regular mode (A.4-A.6).
            q = 81 * q1 + 9 * q2 + q3
            sign = 1
            if q < 0:
                sign, q = -1, -q
            mn, mx = min(ra, rb), max(ra, rb)
            if rc >= mx:
                pxp = mn
            elif rc <= mn:
                pxp = mx
            else:
                pxp = ra + rb - rc
            pxp = min(max(pxp + sign * Cb[q], 0), mv)
            ix = int(src[y, x])
            errval = ix - pxp
            if sign < 0:
                errval = -errval
            if near > 0:
                if errval > 0:
                    errval = (near + errval) // step
                else:
                    errval = -((near - errval) // step)
                rx = pxp + sign * errval * step
                if rx < -near:
                    rx += wrap
                elif rx > mv + near:
                    rx -= wrap
                rx = min(max(rx, 0), mv)
            else:
                rx = ix
            errval = modrange(errval)
            k = 0
            while (N[q] << k) < A[q]:
                k += 1
            if near == 0 and k == 0 and 2 * B[q] <= -N[q]:
                merr = 2 * errval + 1 if errval >= 0 else -2 * (errval + 1)
            else:
                merr = 2 * errval if errval >= 0 else -2 * errval - 1
            _jls_golomb(w, merr, k, limit, qbpp)
            B[q] += errval * step
            A[q] += abs(errval)
            if N[q] == reset:
                A[q] >>= 1
                B[q] = B[q] >> 1 if B[q] >= 0 else -((1 - B[q]) >> 1)
                N[q] >>= 1
            N[q] += 1
            if B[q] <= -N[q]:
                B[q] += N[q]
                if Cb[q] > -128:
                    Cb[q] -= 1
                if B[q] <= -N[q]:
                    B[q] = -N[q] + 1
            elif B[q] > 0:
                B[q] -= N[q]
                if Cb[q] < 127:
                    Cb[q] += 1
                if B[q] > 0:
                    B[q] = 0
            cur[x + 1] = rx
            x += 1
        prev, cur = cur, prev
    w.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    sof = seg(0xF7, struct.pack(">BHHB", precision, rows, cols, 1)
              + bytes([1, 0x11, 0]))
    lse = (seg(0xF8, bytes([1]) + struct.pack(">HHHHH", mv, t1, t2, t3, reset))
           if emit_lse else b"")
    sos = seg(0xDA, bytes([1, 1, 0x00, near, 0, 0]))
    frame = b"\xff\xd8" + sof + lse + sos + bytes(w.out) + b"\xff\xd9"
    if len(frame) % 2:
        frame += b"\x00"  # DICOM items carry even byte counts
    return frame


def test_jls_lossless_roundtrip_16bit(tmp_path):
    """JPEG-LS Lossless (1.2.840.10008.1.2.4.80) decodes bit-exact on a
    mammogram-like image: smooth background (run + low-activity contexts)
    with a noisy center (high-activity contexts)."""
    rng = np.random.default_rng(40)
    rows, cols, bits = 24, 19, 12
    yy, xx = np.mgrid[0:rows, 0:cols]
    px = (80 * yy + 40 * xx).astype(np.uint16)  # smooth ramp
    px[8:20, 5:15] = rng.integers(0, 2**bits, size=(12, 10), dtype=np.uint16)
    p = tmp_path / "jls16.dcm"
    _write_encapsulated(p, rows, cols, bits, b"1.2.840.10008.1.2.4.80",
                        _jls_frame(px, bits))
    img, meta = read_dicom_native(p)
    np.testing.assert_allclose(img, px / (2**bits - 1), atol=1e-7)
    assert meta.patient_id == "PATRLE" and meta.laterality == "R"


def test_jls_lossless_roundtrip_8bit_alloc(tmp_path):
    """8-bit precision stored in BitsAllocated 8 exercises the bps=1
    output path."""
    rng = np.random.default_rng(41)
    rows, cols = 11, 17
    px = rng.integers(0, 256, size=(rows, cols), dtype=np.uint16)
    p = tmp_path / "jls8.dcm"
    _write_encapsulated(p, rows, cols, 8, b"1.2.840.10008.1.2.4.80",
                        _jls_frame(px, 8), bits_alloc=8)
    img, _ = read_dicom_native(p)
    np.testing.assert_allclose(img, px / 255.0, atol=1e-7)


def test_jls_flat_image_pure_run_mode(tmp_path):
    """A constant image is one maximal run per line — the run-segment code
    order (J table) and end-of-line partial-segment rule carry the whole
    stream."""
    px = np.full((16, 300), 1234, dtype=np.uint16)
    p = tmp_path / "jlsflat.dcm"
    _write_encapsulated(p, 16, 300, 12, b"1.2.840.10008.1.2.4.80",
                        _jls_frame(px, 12))
    img, _ = read_dicom_native(p)
    np.testing.assert_allclose(img, px / 4095.0, atol=1e-7)


def test_jls_run_interruptions(tmp_path):
    """Flat stretches broken by single spikes hit run interruption coding
    (both RItype values) and the RUNindex up/down walk."""
    rng = np.random.default_rng(42)
    rows, cols = 13, 57
    px = np.full((rows, cols), 500, dtype=np.uint16)
    for y in range(rows):  # a few spikes per line at random positions
        for xpos in rng.integers(1, cols, size=3):
            px[y, xpos] = rng.integers(0, 4096)
    p = tmp_path / "jlsruns.dcm"
    _write_encapsulated(p, rows, cols, 12, b"1.2.840.10008.1.2.4.80",
                        _jls_frame(px, 12))
    img, _ = read_dicom_native(p)
    np.testing.assert_allclose(img, px / 4095.0, atol=1e-7)


def test_jls_near_lossless(tmp_path):
    """JPEG-LS Near-Lossless (1.2.840.10008.1.2.4.81): every reconstructed
    sample is within NEAR of the source, and the decode matches the
    fixture encoder's own reconstruction exactly."""
    rng = np.random.default_rng(43)
    rows, cols, bits, near = 15, 21, 12, 3
    px = rng.integers(0, 2**bits, size=(rows, cols), dtype=np.uint16)
    px[:5] = 900  # a flat band to drive near-lossless run mode too
    p = tmp_path / "jlsnear.dcm"
    _write_encapsulated(p, rows, cols, bits, b"1.2.840.10008.1.2.4.81",
                        _jls_frame(px, bits, near=near))
    img, _ = read_dicom_native(p)
    got = np.round(img * (2**bits - 1)).astype(np.int64)
    assert np.abs(got - px.astype(np.int64)).max() <= near


def test_jls_near_under_lossless_uid_rejected(tmp_path):
    """A scan carrying NEAR>0 under the Lossless transfer syntax
    (1.2.840.10008.1.2.4.80) is a mislabeled lossy file: PS3.5 A.4.3
    requires NEAR=0 there, so the decoder must refuse it by name instead
    of silently returning approximate pixels."""
    rng = np.random.default_rng(46)
    rows, cols, bits = 9, 12, 12
    px = rng.integers(0, 2**bits, size=(rows, cols), dtype=np.uint16)
    p = tmp_path / "jlsmislabeled.dcm"
    _write_encapsulated(p, rows, cols, bits, b"1.2.840.10008.1.2.4.80",
                        _jls_frame(px, bits, near=2))
    with pytest.raises(ValueError, match="NEAR=2 under the Lossless"):
        read_dicom_native(p)
    # The identical frame is legal (and decodable) under .4.81.
    p81 = tmp_path / "jlsrelabel.dcm"
    _write_encapsulated(p81, rows, cols, bits, b"1.2.840.10008.1.2.4.81",
                        _jls_frame(px, bits, near=2))
    img, _ = read_dicom_native(p81)
    got = np.round(img * (2**bits - 1)).astype(np.int64)
    assert np.abs(got - px.astype(np.int64)).max() <= 2


def test_jls_lse_preset_parameters(tmp_path):
    """An LSE marker overriding MAXVAL/T1/T2/T3/RESET governs the decode
    (T.87 C.2.4.1.1): wrong handling would desynchronize immediately."""
    rng = np.random.default_rng(44)
    rows, cols = 9, 14
    px = rng.integers(0, 3001, size=(rows, cols), dtype=np.uint16)
    p = tmp_path / "jlslse.dcm"
    _write_encapsulated(
        p, rows, cols, 12, b"1.2.840.10008.1.2.4.80",
        _jls_frame(px, 12, maxval=3000, thresholds=(9, 30, 100), reset=31))
    img, _ = read_dicom_native(p)
    np.testing.assert_allclose(img, px / 4095.0, atol=1e-7)


def test_jls_stream_split_across_fragments(tmp_path):
    """JPEG-LS streams concatenate across encapsulated fragments exactly
    like 10918 streams (PS3.5 A.4)."""
    rng = np.random.default_rng(45)
    rows, cols = 12, 12
    px = rng.integers(0, 4096, size=(rows, cols), dtype=np.uint16)
    frame = _jls_frame(px, 12)
    cut = (len(frame) // 2) & ~1
    a, b = frame[:cut], frame[cut:]
    out = b"\x00" * 128 + b"DICM"
    out += _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.4.80")
    out += _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    out += _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    out += _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    out += _el_explicit(0x0028, 0x0101, b"US", struct.pack("<H", 12))
    out += struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00"
    out += struct.pack("<I", 0xFFFFFFFF)
    out += _item(b"") + _item(a) + _item(b)
    out += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    p = tmp_path / "jlssplit.dcm"
    p.write_bytes(out)
    img, _ = read_dicom_native(p)
    np.testing.assert_allclose(img, px / 4095.0, atol=1e-7)


def test_jls_restart_intervals_refused_by_name(tmp_path):
    """DRI inside a JPEG-LS stream is refused with a named error (CharLS —
    pydicom's JPEG-LS backend — refuses these too), never mis-decoded."""
    px = np.zeros((4, 4), np.uint16)
    frame = bytearray(_jls_frame(px, 8))
    dri = bytes([0xFF, 0xDD]) + struct.pack(">H", 4) + struct.pack(">H", 2)
    i = frame.index(b"\xff\xda")
    frame = bytes(frame[:i]) + dri + bytes(frame[i:])
    p = tmp_path / "jlsdri.dcm"
    _write_encapsulated(p, 4, 4, 8, b"1.2.840.10008.1.2.4.80", frame)
    with pytest.raises(ValueError, match="restart"):
        read_dicom_native(p)


def test_jls_mutation_fuzz(tmp_path):
    """Seeded byte-flip/truncation fuzz over the JPEG-LS container: corrupt
    streams must raise ValueError in-process, never crash or hang."""
    rng = np.random.default_rng(46)
    rows, cols = 10, 11
    px = rng.integers(0, 4096, size=(rows, cols), dtype=np.uint16)
    px[:4] = 700
    p = tmp_path / "jlsseed.dcm"
    _write_encapsulated(p, rows, cols, 12, b"1.2.840.10008.1.2.4.80",
                        _jls_frame(px, 12))
    seed_bytes = p.read_bytes()
    target = tmp_path / "fuzz.dcm"
    for trial in range(150):
        data = bytearray(seed_bytes)
        kind = trial % 3
        if kind == 0:
            for _ in range(rng.integers(1, 5)):
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
        elif kind == 1:
            data = data[: rng.integers(1, len(data))]
        else:
            for _ in range(rng.integers(1, 9)):
                data[rng.integers(len(data) // 2, len(data))] = (
                    rng.integers(0, 256)
                )
        target.write_bytes(bytes(data))
        try:
            img, _ = read_dicom_native(target)
            assert img.shape[0] >= 1
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# JPEG sequential DCT (1.2.840.10008.1.2.4.50 Baseline / .51 Extended).
# Independent encoder fixture: float FDCT + quantization + canonical
# Huffman with a flat 9-bit code alphabet (any valid DHT is legal), so the
# decoder's table building, RLE/EOB/ZRL handling, EXTEND, dequant and IDCT
# are all exercised against a second implementation of the spec.

_ZZ = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
       12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
       35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
       58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]


def _dct_basis():
    c = np.zeros((8, 8))
    for u in range(8):
        a = np.sqrt(1 / 8) if u == 0 else 0.5
        for x in range(8):
            c[u, x] = a * np.cos((2 * x + 1) * u * np.pi / 16)
    return c


def _flat_table(values):
    """DHT payload giving every symbol a canonical 9-bit code."""
    counts = [0] * 16
    counts[8] = len(values)  # all codes at length 9
    return bytes(counts), bytes(values), {v: (i, 9) for i, v in enumerate(values)}


def _dct_frame(px, bits, qscale=1.0, restart=0, force_sof1=False):
    """Encode grayscale `px` as a sequential-DCT JPEG; returns
    (stream bytes, the fixture's own reconstruction — what a conforming
    decoder must reproduce to within IDCT rounding)."""
    rows, cols = px.shape
    level = 1 << (bits - 1)
    maxval = (1 << bits) - 1
    qtab = np.maximum(1, np.round((8 + np.arange(64)) * qscale)).astype(int)
    cb = _dct_basis()
    bh, bw = -(-rows // 8), -(-cols // 8)
    padded = np.pad(px.astype(np.float64), ((0, bh * 8 - rows), (0, bw * 8 - cols)),
                    mode="edge") - level
    coefs = np.zeros((bh, bw, 64), np.int64)  # zigzag order, quantized
    recon = np.zeros((bh * 8, bw * 8))
    for by in range(bh):
        for bx in range(bw):
            blk = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
            f = cb @ blk @ cb.T
            deq = np.zeros((8, 8))
            for k in range(64):
                z = _ZZ[k]
                qc = int(np.round(f.flat[z] / qtab[k]))
                coefs[by, bx, k] = qc
                deq.flat[z] = qc * qtab[k]
            recon[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = cb.T @ deq @ cb
    expected = np.clip(np.round(recon[:rows, :cols]) + level, 0, maxval)

    dc_counts, dc_vals, dc_code = _flat_table(list(range(16)))
    ac_syms = [0x00] + [(r << 4) | s for r in range(16) for s in range(1, 16)]
    ac_syms.append(0xF0)
    ac_counts, ac_vals, ac_code = _flat_table(ac_syms)
    w = _BitWriter()
    pred, since, rst = 0, 0, 0

    def put_sym(code_map, sym):
        c, ln = code_map[sym]
        w.put(c, ln)

    def put_extend(v, s):
        w.put(v if v >= 0 else v + (1 << s) - 1, s)

    for by in range(bh):
        for bx in range(bw):
            if restart and since == restart:
                w.align()
                w.out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                since = 0
                pred = 0
            qc = coefs[by, bx]
            diff = int(qc[0]) - pred
            pred = int(qc[0])
            t = abs(diff).bit_length()
            put_sym(dc_code, t)
            if t:
                put_extend(diff, t)
            k = 1
            while k < 64:
                j = k
                while j < 64 and qc[j] == 0:
                    j += 1
                if j == 64:
                    put_sym(ac_code, 0x00)  # EOB
                    break
                r = j - k
                while r >= 16:
                    put_sym(ac_code, 0xF0)  # ZRL
                    r -= 16
                v = int(qc[j])
                s = abs(v).bit_length()
                put_sym(ac_code, (r << 4) | s)
                put_extend(v, s)
                k = j + 1
            since += 1
    w.align()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    pq = 1 if qtab.max() > 255 or bits == 12 else 0
    qbody = bytes([pq << 4]) + (
        b"".join(struct.pack(">H", int(v)) for v in qtab) if pq
        else bytes(int(v) for v in qtab))
    sof_marker = 0xC1 if (bits == 12 or force_sof1) else 0xC0
    out = b"\xff\xd8"
    out += seg(0xDB, qbody)
    out += seg(sof_marker,
               struct.pack(">BHHB", bits, rows, cols, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + dc_counts + dc_vals)
    out += seg(0xC4, bytes([0x11]) + ac_counts + ac_vals)
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    out += seg(0xDA, bytes([1, 1, 0x01, 0, 63, 0]))
    out += bytes(w.out) + b"\xff\xd9"
    if len(out) % 2:
        out += b"\x00"
    return out, expected.astype(np.int64)


def test_jpeg_baseline_8bit(tmp_path):
    """JPEG Baseline (1.2.840.10008.1.2.4.50): the decode matches the
    fixture's own dequant+IDCT reconstruction to within rounding (+-1)."""
    rng = np.random.default_rng(50)
    rows, cols = 21, 26
    yy, xx = np.mgrid[0:rows, 0:cols]
    px = np.clip(120 + 60 * np.sin(yy / 3) + 50 * np.cos(xx / 4)
                 + rng.normal(0, 10, (rows, cols)), 0, 255).astype(np.uint16)
    frame, expected = _dct_frame(px, 8)
    p = tmp_path / "jbase.dcm"
    _write_encapsulated(p, rows, cols, 8, b"1.2.840.10008.1.2.4.50", frame,
                        bits_alloc=8)
    img, _ = read_dicom_native(p)
    got = np.round(img * 255).astype(np.int64)
    assert np.abs(got - expected).max() <= 1
    # and the lossy error vs the source is bounded by the quantizers
    assert np.abs(got - px.astype(np.int64)).mean() < 12


def test_jpeg_extended_12bit_with_restarts(tmp_path):
    """JPEG Extended (1.2.840.10008.1.2.4.51, SOF1, 12-bit, 16-bit DQT,
    restart intervals) — the mammography presentation encoding."""
    rng = np.random.default_rng(51)
    rows, cols = 19, 22
    yy, xx = np.mgrid[0:rows, 0:cols]
    px = np.clip(2000 + 900 * np.sin(yy / 2.5) + 800 * np.cos(xx / 3.5)
                 + rng.normal(0, 60, (rows, cols)), 0, 4095).astype(np.uint16)
    frame, expected = _dct_frame(px, 12, qscale=2.0, restart=2)
    p = tmp_path / "jext.dcm"
    _write_encapsulated(p, rows, cols, 12, b"1.2.840.10008.1.2.4.51", frame)
    img, _ = read_dicom_native(p)
    got = np.round(img * 4095).astype(np.int64)
    assert np.abs(got - expected).max() <= 1


def test_jpeg_extended_8bit_sof1(tmp_path):
    """Process 2 proper: 8-bit data in an SOF1 frame under .4.51."""
    rng = np.random.default_rng(52)
    px = rng.integers(0, 256, size=(8, 8), dtype=np.uint16)
    frame, expected = _dct_frame(px, 8, force_sof1=True)
    p = tmp_path / "jext8.dcm"
    _write_encapsulated(p, 8, 8, 8, b"1.2.840.10008.1.2.4.51", frame,
                        bits_alloc=8)
    img, _ = read_dicom_native(p)
    got = np.round(img * 255).astype(np.int64)
    assert np.abs(got - expected).max() <= 1


def test_jpeg_progressive_refused_by_name(tmp_path):
    """SOF2 (progressive) under a DCT transfer syntax is refused naming the
    frame type, never mis-decoded."""
    px = np.full((8, 8), 77, np.uint16)
    frame, _ = _dct_frame(px, 8)
    frame = bytearray(frame)
    i = frame.index(b"\xff\xc0")
    frame[i + 1] = 0xC2
    p = tmp_path / "jprog.dcm"
    _write_encapsulated(p, 8, 8, 8, b"1.2.840.10008.1.2.4.50", bytes(frame),
                        bits_alloc=8)
    with pytest.raises(ValueError, match="SOF2"):
        read_dicom_native(p)


def test_jpeg_dct_mutation_fuzz(tmp_path):
    """Mutation fuzz over the sequential-DCT container: corrupt streams
    raise ValueError in-process, never crash or hang."""
    rng = np.random.default_rng(53)
    px = rng.integers(0, 4096, size=(17, 13), dtype=np.uint16)
    frame, _ = _dct_frame(px, 12, restart=3)
    p = tmp_path / "jdctseed.dcm"
    _write_encapsulated(p, 17, 13, 12, b"1.2.840.10008.1.2.4.51", frame)
    seed_bytes = p.read_bytes()
    target = tmp_path / "fuzz.dcm"
    for trial in range(150):
        data = bytearray(seed_bytes)
        kind = trial % 3
        if kind == 0:
            for _ in range(rng.integers(1, 5)):
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
        elif kind == 1:
            data = data[: rng.integers(1, len(data))]
        else:
            for _ in range(rng.integers(1, 9)):
                data[rng.integers(len(data) // 2, len(data))] = (
                    rng.integers(0, 256)
                )
        target.write_bytes(bytes(data))
        try:
            img, _ = read_dicom_native(target)
            assert img.shape[0] >= 1
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# JPEG 2000 Part 1 (1.2.840.10008.1.2.4.90, ISO 15444-1 / ITU-T T.800).
# Fixtures are encoded by OpenJPEG (through Pillow) — an independent
# encoder — and decoded natively, so the MQ coder, EBCOT Tier-1/Tier-2,
# tag trees, and 5/3 synthesis are pinned against a third-party
# implementation of the spec, not against themselves.  The reference gets
# this syntax through pydicom's handler stack (dataset.py:4,93-105,180).

_HAVE_J2K_ENCODER = False
try:  # pragma: no cover - capability probe
    from PIL import Image as _PILImage
    from PIL import features as _PILfeatures

    _HAVE_J2K_ENCODER = bool(_PILfeatures.check_codec("jpg_2000"))
except Exception:  # pragma: no cover
    pass

j2k_fixture = pytest.mark.skipif(
    not _HAVE_J2K_ENCODER, reason="Pillow lacks the OpenJPEG codec"
)


def _j2k_codestream(px: np.ndarray, **save_kw) -> bytes:
    """Raw JPEG 2000 codestream (SOC..EOC) for `px` via OpenJPEG,
    reversible 5/3 unless overridden."""
    import io

    save_kw.setdefault("irreversible", False)
    buf = io.BytesIO()
    _PILImage.fromarray(px).save(
        buf, format="JPEG2000", no_jp2=True, **save_kw
    )
    return buf.getvalue()


def _openjpeg_decode(codestream: bytes) -> np.ndarray:
    import io

    im = _PILImage.open(io.BytesIO(codestream))
    im.load()
    return np.asarray(im)


def _write_encapsulated_fragments(path, rows, cols, bits_stored,
                                  syntax_uid: bytes, fragments):
    """Like _write_encapsulated but with the stream split across multiple
    pixel-data items (PS3.5 A.4 allows any even-length fragmentation)."""
    out = b"\x00" * 128 + b"DICM"
    out += _el_explicit(0x0002, 0x0010, b"UI", syntax_uid)
    out += _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    out += _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    out += _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    out += _el_explicit(0x0028, 0x0101, b"US", struct.pack("<H", bits_stored))
    out += struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00"
    out += struct.pack("<I", 0xFFFFFFFF)
    out += _item(b"")  # empty Basic Offset Table
    for frag in fragments:
        if len(frag) % 2:
            frag += b"\x00"
        out += _item(frag)
    out += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    with open(path, "wb") as f:
        f.write(out)


@j2k_fixture
def test_j2k_16bit_roundtrip(tmp_path):
    """12-bit mammography values in a 16-bit reversible codestream decode
    bit-exact (default OpenJPEG geometry: 64x64 codeblocks, 6 levels)."""
    rng = np.random.default_rng(90)
    rows, cols, bits = 50, 66, 12
    px = rng.integers(0, 2**bits, size=(rows, cols), dtype=np.uint16)
    p = tmp_path / "j2k16.dcm"
    _write_encapsulated(p, rows, cols, bits, b"1.2.840.10008.1.2.4.90",
                        _j2k_codestream(px))
    img, meta = read_dicom_native(p)
    np.testing.assert_allclose(img, px / (2**bits - 1), atol=1e-7)
    assert meta.patient_id == "PATRLE"


@j2k_fixture
def test_j2k_8bit_roundtrip(tmp_path):
    """8-bit / BitsAllocated 8 path (bps=1 output lane)."""
    rng = np.random.default_rng(91)
    px = rng.integers(0, 256, size=(40, 56), dtype=np.uint8)
    p = tmp_path / "j2k8.dcm"
    _write_encapsulated(p, 40, 56, 8, b"1.2.840.10008.1.2.4.90",
                        _j2k_codestream(px), bits_alloc=8)
    img, _ = read_dicom_native(p)
    np.testing.assert_allclose(img, px / 255, atol=1e-7)


def _j2k_smooth(rows=120, cols=90, bits=12):
    yy, xx = np.mgrid[0:rows, 0:cols]
    return (
        (np.sin(yy / 9.0) + np.cos(xx / 13.0) + 2) / 4 * (2**bits - 1)
    ).astype(np.uint16)


@j2k_fixture
@pytest.mark.parametrize("prog", ["LRCP", "RLCP", "RPCL", "PCRL", "CPRL"])
def test_j2k_progression_orders(tmp_path, prog):
    """All five T.800 B.12 progression orders resequence packets; the
    decode must be identical under each."""
    px = _j2k_smooth()
    p = tmp_path / f"j2k_{prog}.dcm"
    _write_encapsulated(p, *px.shape, 12, b"1.2.840.10008.1.2.4.90",
                        _j2k_codestream(px, progression=prog,
                                        num_resolutions=4))
    img, _ = read_dicom_native(p)
    np.testing.assert_allclose(img, px / 4095, atol=1e-7)


@j2k_fixture
def test_j2k_codeblocks_precincts_layers(tmp_path):
    """Non-default codeblock (16x16) and precinct (64x64) geometry plus two
    quality layers (rate-limited first layer, lossless final layer):
    exercises tag-tree persistence across layers and Lblock growth."""
    px = _j2k_smooth()
    frame = _j2k_codestream(px, codeblock_size=(16, 16),
                            precinct_size=(64, 64), num_resolutions=4,
                            quality_mode="rates", quality_layers=[8, 0])
    p = tmp_path / "j2k_geom.dcm"
    _write_encapsulated(p, *px.shape, 12, b"1.2.840.10008.1.2.4.90", frame)
    img, _ = read_dicom_native(p)
    np.testing.assert_allclose(img, px / 4095, atol=1e-7)


@j2k_fixture
def test_j2k_deep_decomposition(tmp_path):
    """Seven resolution levels on a non-power-of-two canvas: odd band
    origins and single-sample bands hit the 5/3 synthesis edge cases."""
    px = _j2k_smooth(137, 101)
    p = tmp_path / "j2k_deep.dcm"
    _write_encapsulated(p, *px.shape, 12, b"1.2.840.10008.1.2.4.90",
                        _j2k_codestream(px, num_resolutions=7))
    img, _ = read_dicom_native(p)
    np.testing.assert_allclose(img, px / 4095, atol=1e-7)


@j2k_fixture
def test_j2k_tiled_8bit(tmp_path):
    """Multiple tiles (2x3 grid with partial edge tiles) decode and
    assemble; 8-bit because Pillow's 16-bit tiled ENCODE is broken (see
    test_j2k_tiled_16bit_matches_openjpeg)."""
    rng = np.random.default_rng(92)
    px = rng.integers(0, 256, size=(40, 56), dtype=np.uint8)
    p = tmp_path / "j2k_tiled.dcm"
    _write_encapsulated(p, 40, 56, 8, b"1.2.840.10008.1.2.4.90",
                        _j2k_codestream(px, tile_size=(32, 16),
                                        num_resolutions=3), bits_alloc=8)
    img, _ = read_dicom_native(p)
    np.testing.assert_allclose(img, px / 255, atol=1e-7)


@j2k_fixture
def test_j2k_tiled_16bit_matches_openjpeg(tmp_path):
    """Pillow 12.1's 16-bit tiled encode corrupts tiles with x0>0 (its own
    decode does not round-trip), so pin decoder-vs-decoder agreement: the
    native decode must equal OpenJPEG's decode of the same codestream
    bit-for-bit."""
    px = _j2k_smooth(64, 96)
    frame = _j2k_codestream(px, tile_size=(48, 32), num_resolutions=3)
    want = _openjpeg_decode(frame).astype(np.int64)
    p = tmp_path / "j2k_t16.dcm"
    _write_encapsulated(p, *px.shape, 12, b"1.2.840.10008.1.2.4.90", frame)
    img, _ = read_dicom_native(p)
    got = np.rint(img * 4095).astype(np.int64)
    np.testing.assert_array_equal(got, want)


@j2k_fixture
def test_j2k_jp2_wrapped(tmp_path):
    """PS3.5 A.4.4 mandates raw codestreams, but archives do encapsulate
    JP2-wrapped files; the box walk must find the jp2c codestream."""
    import io

    px = _j2k_smooth(48, 40)
    buf = io.BytesIO()
    _PILImage.fromarray(px).save(buf, format="JPEG2000", irreversible=False)
    p = tmp_path / "j2k_jp2.dcm"
    _write_encapsulated(p, *px.shape, 12, b"1.2.840.10008.1.2.4.90",
                        buf.getvalue())
    img, _ = read_dicom_native(p)
    np.testing.assert_allclose(img, px / 4095, atol=1e-7)


@j2k_fixture
def test_j2k_informational_markers_skipped(tmp_path):
    """PLT (packet-length, tile-part) and COM segments are skipped, not
    fatal."""
    px = _j2k_smooth(48, 40)
    p = tmp_path / "j2k_plt.dcm"
    _write_encapsulated(p, *px.shape, 12, b"1.2.840.10008.1.2.4.90",
                        _j2k_codestream(px, plt=True, comment=b"fixture"))
    img, _ = read_dicom_native(p)
    np.testing.assert_allclose(img, px / 4095, atol=1e-7)


@j2k_fixture
def test_j2k_stream_split_across_fragments(tmp_path):
    """A J2K stream may legally span multiple pixel-data fragments; they
    concatenate (PS3.5 A.4)."""
    px = _j2k_smooth(48, 40)
    frame = _j2k_codestream(px)
    cut = len(frame) // 2
    cut -= cut % 2  # fragments must be even-length
    p = tmp_path / "j2k_frag.dcm"
    _write_encapsulated_fragments(
        p, *px.shape, 12, b"1.2.840.10008.1.2.4.90",
        [frame[:cut], frame[cut:]])
    img, _ = read_dicom_native(p)
    np.testing.assert_allclose(img, px / 4095, atol=1e-7)


@j2k_fixture
def test_j2k_irreversible_97_refused(tmp_path):
    """An irreversible 9/7 codestream under the Lossless-Only UID is
    refused with the wavelet named (decode would not be bit-exact)."""
    px = _j2k_smooth(48, 40)
    p = tmp_path / "j2k_97.dcm"
    _write_encapsulated(p, *px.shape, 12, b"1.2.840.10008.1.2.4.90",
                        _j2k_codestream(px, irreversible=True))
    with pytest.raises(ValueError, match="9/7"):
        read_dicom_native(p)


@j2k_fixture
def test_j2k_multicomponent_refused(tmp_path):
    """A 3-component (RGB) codestream is refused naming the component
    count: the mammography pipeline is grayscale-only."""
    rng = np.random.default_rng(93)
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    p = tmp_path / "j2k_rgb.dcm"
    _write_encapsulated(p, 16, 16, 8, b"1.2.840.10008.1.2.4.90",
                        _j2k_codestream(px), bits_alloc=8)
    with pytest.raises(ValueError, match="components|component transform"):
        read_dicom_native(p)


@j2k_fixture
def test_j2k_garbage_and_size_mismatch(tmp_path):
    """Not-a-codestream and SIZ/Rows-Columns disagreement both raise."""
    p = tmp_path / "j2k_bad.dcm"
    _write_encapsulated(p, 8, 8, 12, b"1.2.840.10008.1.2.4.90", b"\x12" * 64)
    with pytest.raises(ValueError, match="SOC"):
        read_dicom_native(p)
    px = _j2k_smooth(48, 40)
    q = tmp_path / "j2k_dim.dcm"
    _write_encapsulated(q, 48, 44, 12, b"1.2.840.10008.1.2.4.90",
                        _j2k_codestream(px))
    with pytest.raises(ValueError, match="Rows/Columns"):
        read_dicom_native(q)


@j2k_fixture
def test_j2k_mutation_fuzz(tmp_path):
    """Mutation fuzz over the J2K container: corrupt codestreams raise
    ValueError in-process, never crash or hang (same contract as the other
    codecs; the deep ASan+UBSan campaign runs in tools/fuzz_dicom.py)."""
    rng = np.random.default_rng(94)
    px = _j2k_smooth(40, 36)
    seeds = [
        _j2k_codestream(px, num_resolutions=3),
        _j2k_codestream(px, codeblock_size=(16, 16),
                        precinct_size=(64, 64), quality_mode="rates",
                        quality_layers=[8, 0]),
    ]
    target = tmp_path / "fuzz.dcm"
    for seed in seeds:
        for trial in range(120):
            data = bytearray(seed)
            kind = trial % 3
            if kind == 0:
                for _ in range(rng.integers(1, 5)):
                    data[rng.integers(0, len(data))] = rng.integers(0, 256)
            elif kind == 1:
                data = bytes(data[: rng.integers(1, len(data))])
            else:
                for _ in range(rng.integers(1, 9)):
                    data[rng.integers(len(data) // 2, len(data))] = (
                        rng.integers(0, 256)
                    )
            _write_encapsulated(target, 40, 36, 12,
                                b"1.2.840.10008.1.2.4.90", bytes(data))
            try:
                img, _ = read_dicom_native(target)
                assert img.shape[0] >= 1
            except ValueError:
                pass


@j2k_fixture
def test_j2k_bag_loader_end_to_end(tmp_path):
    """Full data-path check over .90 files: a CC/MLO pair of JPEG
    2000-compressed DICOMs flows through the native reader and BagLoader
    into a padded bag, with the pixel values bit-exact vs the pre-encode
    originals (reference reads the same files via pydicom,
    dataset.py:93-105,180)."""
    from montecarlo_gated_mil_tpu.data.pipeline import BagLoader, PipelineConfig
    from montecarlo_gated_mil_tpu.data.records import BagRecord

    rng = np.random.default_rng(95)
    shapes = {"CC": None, "MLO": None}
    for view in shapes:
        px = rng.integers(100, 4096, size=(64, 64), dtype=np.uint16)
        shapes[view] = px
        p = tmp_path / f"q_L_{view}.dcm"
        out = b"\x00" * 128 + b"DICM"
        out += _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.4.90")
        out += _el_explicit(0x0010, 0x0020, b"LO", b"PATJ2K")
        out += _el_explicit(0x0010, 0x1010, b"AS", b"051Y")
        out += _el_explicit(0x0020, 0x0062, b"CS", b"L")
        out += _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", 64))
        out += _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", 64))
        out += _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16))
        out += _el_explicit(0x0028, 0x0101, b"US", struct.pack("<H", 12))
        out += _el_explicit(0x0028, 0x0103, b"US", struct.pack("<H", 0))
        out += struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00"
        out += struct.pack("<I", 0xFFFFFFFF)
        out += _item(b"")
        frame = _j2k_codestream(px, num_resolutions=3)
        if len(frame) % 2:
            frame += b"\x00"
        out += _item(frame)
        out += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
        p.write_bytes(out)

    reader = make_native_dicom_reader()
    rec = BagRecord(
        paths=(str(tmp_path / "q_L_CC.dcm"), str(tmp_path / "q_L_MLO.dcm")),
        class_name="Malignant", view="Left", laterality="L",
    )
    # reader-level: bit-exact decode
    out = reader(rec)
    np.testing.assert_allclose(out.images[0], shapes["CC"] / 4095, atol=1e-7)
    np.testing.assert_allclose(out.images[1], shapes["MLO"] / 4095, atol=1e-7)
    assert out.meta.patient_id == "PATJ2K" and out.meta.age == 51
    # loader-level: the pair tiles into a padded bag
    cfg = PipelineConfig(height=128, width=64, patch_size=32, overlap=0.0,
                         empty_threshold=0.0, bucket=8)
    loader = BagLoader([rec], reader, cfg, multimodal=True)
    (bag, out_rec), = list(loader.epoch(0))
    assert int(bag.label) == 1 and out_rec.patient_id == "PATJ2K"
    assert int(bag.num_instances) >= 1
    assert bag.patches.shape[0] % 8 == 0
