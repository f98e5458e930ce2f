"""Measure the reference's serial-MCDO pattern in torch on CPU.

The reference publishes no numbers (BASELINE.md), so this establishes them:
its exact computational pattern — ResNet-18 features once, then T *serial*
dropout passes of the gated-attention head (``/root/reference/model.py:
330-401``) — on synthetic bags, in torch, on the hardware available to it
here (CPU; no CUDA, no torchvision in this image).  Writes
BASELINE_measured.json, which bench.py uses as the vs_baseline denominator.

Run:  python tools/measure_baseline.py [--bag 256] [--samples 30] [--patch 224]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
from torch_ref import TorchMultiHeadGAMIL  # noqa: E402


def measure(bag_size: int, num_samples: int, patch: int, repeats: int = 3) -> dict:
    torch.manual_seed(0)
    model = TorchMultiHeadGAMIL(backbone="r18").eval()
    bag = torch.randn(bag_size, 3, patch, patch)

    def enable_dropout(m):
        if isinstance(m, torch.nn.Dropout):
            m.train()

    model.apply(enable_dropout)

    def serial_mcdo():
        with torch.no_grad():
            H = model.feature_extractor(bag)
            for _ in range(num_samples):
                Hd = model.feature_dropout(H)
                ys = []
                for i in range(model.num_classes):
                    av = model.attention_V(Hd)
                    au = model.attention_U(Hd)
                    logits = model.attention_weights[i](av * au).squeeze(-1)
                    logits = model.attention_dropouts[i](logits)
                    a = torch.softmax(logits, dim=-1)
                    ys.append(model.classifiers[i](a @ Hd))
        return ys

    serial_mcdo()  # warmup
    times = []
    for _ in range(repeats):
        t0 = time.time()
        serial_mcdo()
        times.append(time.time() - t0)
    best = min(times)
    return {
        "pattern": "serial MCDO (features once + T serial head passes), torch CPU",
        "bag_size": bag_size,
        "patch": patch,
        "num_samples": num_samples,
        "seconds_per_bag": best,
        "bags_per_second": 1.0 / best,
        "threads": torch.get_num_threads(),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--bag", type=int, default=256)
    ap.add_argument("--samples", type=int, default=30)
    ap.add_argument("--patch", type=int, default=224)
    ap.add_argument("--out", type=str, default="BASELINE_measured.json")
    args = ap.parse_args()
    result = measure(args.bag, args.samples, args.patch)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
