"""Record selection from the metadata table.

Capability spec: the reference reads a pickled pandas DataFrame with per-
patient ``view``/``filename``/``class`` lists and selects either unimodal
view records or paired CC+MLO records per laterality
(``/root/reference/dataset.py:114-160``).  Labels: 1 iff class is Malignant
or Lymph_nodes (``dataset.py:48``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

POSITIVE_CLASSES = frozenset({"Malignant", "Lymph_nodes"})
CLASS_TO_GROUP = {"Normal": 0, "Benign": 0, "Malignant": 1, "Lymph_nodes": 1}


@dataclass(frozen=True)
class BagRecord:
    """One bag-to-be: file path(s), class name, laterality, view.

    ``laterality`` starts as the metadata-table/view heuristic and is
    superseded by the DICOM ``ImageLaterality`` tag once pixels are read
    (reference reads it from the file, ``dataset.py:57,62``);
    ``patient_id``/``age`` likewise fill from the DICOM header
    (``dataset.py:51-64``) — the loader yields the enriched record.
    """

    paths: tuple[str, ...]  # 1 file (unimodal) or (CC, MLO) pair (multimodal)
    class_name: str
    view: str
    laterality: str = ""
    patient_id: str = ""
    age: int = -1

    @property
    def label(self) -> int:
        return 1 if self.class_name in POSITIVE_CLASSES else 0


@dataclass(frozen=True)
class PixelData:
    """Reader output carrying pixels plus the source file's DICOM metadata.

    ``images`` is ``(img,)`` unimodal or ``(cc, mlo)`` multimodal; ``meta``
    is a :class:`~montecarlo_gated_mil_tpu.data.dicom.DicomMeta` (or None for
    metadata-less readers).  Plain arrays / (cc, mlo) tuples remain valid
    reader outputs for synthetic and custom readers.
    """

    images: tuple
    meta: object | None = None


def select_records(
    patients: Sequence[dict], view: Sequence[str], multimodal: bool
) -> list[BagRecord]:
    """Flatten the patient table into records.

    ``patients``: dicts with ``view``/``filename``/``class`` parallel lists
    (the reference's ``df.to_dict('records')``).  Multimodal mode pairs the
    left CC+MLO files into one record and the right pair into another,
    skipping incomplete pairs (spec: ``dataset.py:122-143``); unimodal mode
    emits one record per file whose view contains any requested view string
    (``dataset.py:145-151``).
    """
    records: list[BagRecord] = []
    if multimodal:
        for p in patients:
            views, files, classes = p["view"], p["filename"], p["class"]
            for side, cc_tag, mlo_tag in (("L", "L_C", "L_M"), ("R", "R_C", "R_M")):
                if f"{side}CC" in views and f"{side}MLO" in views:
                    flist = tuple(f for f in files if cc_tag in f or mlo_tag in f)
                    if len(flist) != 2:
                        continue
                    cls = classes[0] if side == "L" else classes[-1]
                    records.append(
                        BagRecord(
                            paths=flist,
                            class_name=cls,
                            view="Left" if side == "L" else "Right",
                            laterality=side,
                        )
                    )
    else:
        for p in patients:
            for i in range(len(p["class"])):
                for v in view:
                    if v in p["view"][i]:
                        records.append(
                            BagRecord(
                                paths=(p["filename"][i],),
                                class_name=p["class"][i],
                                view=p["view"][i],
                                laterality="R" if "R" in p["view"][i][:1] else "L",
                            )
                        )
    return records


def class_weights(records: Sequence[BagRecord]) -> tuple[dict[int, float], list[float]]:
    """Inverse-group-frequency weights (spec: ``/root/reference/utils.py:259-275``).

    Returns ``(group -> weight, per-record sample weights)`` where weight =
    total / group_count.
    """
    group_counts = {0: 0, 1: 0}
    for r in records:
        group_counts[CLASS_TO_GROUP.get(r.class_name, r.label)] += 1
    total = sum(group_counts.values())
    weights = {
        g: (total / c if c else 0.0) for g, c in group_counts.items()
    }
    sample_w = [weights[CLASS_TO_GROUP.get(r.class_name, r.label)] for r in records]
    return weights, sample_w
