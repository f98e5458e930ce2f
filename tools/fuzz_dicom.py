"""Deep ASan+UBSan mutation-fuzz campaign over the native DICOM decoders.

The in-suite fuzz tests (tests/test_dicom_native.py::*_mutation_fuzz) run a
few hundred trials per codec in-process as a regression tripwire; this tool
is the heavy campaign run once per decoder change: it compiles
native/dicom.cc with ``-fsanitize=address,undefined``, generates seed files
for EVERY supported container/codec (using the same independent encoders
the test fixtures use), and drives tens of thousands of mutated inputs
through a persistent sanitizer-instrumented subprocess.  Any sanitizer
fault kills the subprocess, and the offending input is preserved.

Usage:
    python tools/fuzz_dicom.py [--trials-per-seed 1000] [--seed 0]

Results of past campaigns are recorded in docs/ROADMAP.md.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))

FUZZ_MAIN = r"""
#include <cstdio>
#include <cstring>
extern "C" {
struct DicomResult;
int mcgmil_dicom_read(const char* path, void* result);
void mcgmil_dicom_free(void* result);
}
// Mirror of the result struct's size envelope: allocate generously and let
// the real definition (linked from dicom.cc) fill it.
int main() {
  static char buf[4096];
  char line[4096];
  while (fgets(line, sizeof(line), stdin)) {
    line[strcspn(line, "\n")] = 0;
    if (!line[0]) continue;
    memset(buf, 0, sizeof(buf));
    int rc = mcgmil_dicom_read(line, buf);
    if (rc == 0) mcgmil_dicom_free(buf);
    printf("rc %d\n", rc);
    fflush(stdout);
  }
  return 0;
}
"""


def build_fuzzer(tmp: str) -> str:
    src = os.path.join(tmp, "fuzz_main.cc")
    with open(src, "w") as f:
        f.write(FUZZ_MAIN)
    out = os.path.join(tmp, "dicom_fuzz")
    subprocess.run(
        [
            "g++", "-O1", "-g", "-fsanitize=address,undefined",
            "-fno-sanitize-recover=all", "-o", out,
            os.path.join(REPO, "native", "dicom.cc"), src, "-lz",
        ],
        check=True,
    )
    return out


def make_seeds(tmp: str, rng: np.random.Generator) -> list[str]:
    from test_dicom_native import (  # noqa: E402
        _dct_frame,
        _jls_frame,
        _jpeg_lossless_frame,
        _rle_frame,
        _write_deflated,
        _write_dicom,
        _write_encapsulated,
    )

    rows, cols, bits = 24, 20, 12
    px = rng.integers(0, 2**bits, size=(rows, cols), dtype=np.uint16)
    seeds = []

    def emit(name, writer):
        p = os.path.join(tmp, name + ".dcm")
        writer(p)
        seeds.append(p)

    emit("plain", lambda p: _write_dicom(p, rows, cols, bits, px))
    emit("implicit",
         lambda p: _write_dicom(p, rows, cols, bits, px, explicit=False))
    emit("deflated", lambda p: _write_deflated(p, rows, cols, bits, px))
    emit("rle", lambda p: _write_encapsulated(
        p, rows, cols, bits, b"1.2.840.10008.1.2.5", _rle_frame(px)))
    emit("jpll", lambda p: _write_encapsulated(
        p, rows, cols, bits, b"1.2.840.10008.1.2.4.70",
        _jpeg_lossless_frame(px, bits, restart=7)))
    emit("jls", lambda p: _write_encapsulated(
        p, rows, cols, bits, b"1.2.840.10008.1.2.4.80",
        _jls_frame(px, bits)))
    emit("jdct", lambda p: _write_encapsulated(
        p, rows, cols, bits, b"1.2.840.10008.1.2.4.51",
        _dct_frame(px, bits, restart=3)[0]))

    try:
        from test_dicom_native import _j2k_codestream

        j2k_variants = {
            "j2k_basic": dict(num_resolutions=4),
            "j2k_geom": dict(codeblock_size=(16, 16),
                             precinct_size=(64, 64),
                             quality_mode="rates", quality_layers=[8, 0]),
            "j2k_tiled": dict(tile_size=(16, 16), num_resolutions=2),
            "j2k_pcrl": dict(progression="PCRL", num_resolutions=3),
        }
        for name, kw in j2k_variants.items():
            frame = _j2k_codestream(px, **kw)
            emit(name, lambda p, fr=frame: _write_encapsulated(
                p, rows, cols, bits, b"1.2.840.10008.1.2.4.90", fr))
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(px).save(buf, format="JPEG2000", irreversible=False)
        emit("j2k_jp2", lambda p: _write_encapsulated(
            p, rows, cols, bits, b"1.2.840.10008.1.2.4.90", buf.getvalue()))
    except Exception as e:  # pragma: no cover
        print(f"[fuzz] J2K seeds unavailable: {e}")

    return seeds


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials-per-seed", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)

    tmp = tempfile.mkdtemp(prefix="dicom_fuzz_")
    fuzzer = build_fuzzer(tmp)
    seeds = make_seeds(tmp, rng)
    print(f"[fuzz] {len(seeds)} seeds, {args.trials_per_seed} trials each")

    proc = subprocess.Popen(
        [fuzzer], stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=sys.stderr, text=True,
        env={**os.environ,
             "ASAN_OPTIONS": "abort_on_error=1:detect_leaks=1",
             "UBSAN_OPTIONS": "halt_on_error=1"},
    )
    target = os.path.join(tmp, "fuzz_input.dcm")
    total = 0
    faults = 0
    for sp in seeds:
        seed_bytes = open(sp, "rb").read()
        for trial in range(args.trials_per_seed):
            data = bytearray(seed_bytes)
            kind = trial % 4
            if kind == 0:  # flip 1-4 random bytes anywhere
                for _ in range(rng.integers(1, 5)):
                    data[rng.integers(0, len(data))] = rng.integers(0, 256)
            elif kind == 1:  # truncate
                data = data[: rng.integers(1, len(data))]
            elif kind == 2:  # flip 1-8 bytes in the tail (entropy data)
                for _ in range(rng.integers(1, 9)):
                    data[rng.integers(len(data) // 2, len(data))] = (
                        rng.integers(0, 256)
                    )
            else:  # splice a random window from elsewhere in the file
                n = len(data)
                w = int(rng.integers(2, max(3, n // 8)))
                src = int(rng.integers(0, n - w))
                dst = int(rng.integers(0, n - w))
                data[dst:dst + w] = data[src:src + w]
            with open(target, "wb") as f:
                f.write(bytes(data))
            try:
                proc.stdin.write(target + "\n")
                proc.stdin.flush()
                line = proc.stdout.readline()
            except BrokenPipeError:
                line = ""
            if not line:
                faults += 1
                keep = os.path.join(tmp, f"CRASH_{os.path.basename(sp)}_{trial}")
                os.replace(target, keep)
                print(f"[fuzz] FAULT on {sp} trial {trial}; input: {keep}")
                proc = subprocess.Popen(
                    [fuzzer], stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                    stderr=sys.stderr, text=True)
            total += 1
        print(f"[fuzz] {os.path.basename(sp)}: done ({total} total)")
    proc.stdin.close()
    proc.wait(timeout=30)
    print(f"[fuzz] {total} trials, {faults} faults")
    return 1 if faults else 0


if __name__ == "__main__":
    sys.exit(main())
