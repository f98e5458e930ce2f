#!/usr/bin/env python
"""Render the uncertainty-quality validation figure (VERDICT r04 item 7).

Runs the exact harness of ``tests/test_uncertainty.py`` — brief training on
synthetic lesion bags, then MC-dropout inference on clear vs
constructed-ambiguous bags — and renders the evidence that the rebuilt
pipeline's uncertainty is *informative* (the reference's reason to exist:
``/root/reference/infer.py:47-79``):

  A. predictive MC std (ddof=0 over T of p(malignant)) per bag,
  B. predictive entropy of the mean softmax per bag,
       both clearly higher on ambiguous bags than on clear ones;
  C. attention mass on the injected lesion tiles vs the uniform share,
  D. MC attention std on lesion vs background tiles (spread lives where
       the signal is).

Writes docs/uncertainty_validation.png and prints the summary numbers.
Deterministic (fixed seeds, CPU backend — forced so the figure matches the
test suite bit-for-bit and never touches the TPU tunnel).

Usage: python tools/validate_uncertainty.py
"""

from __future__ import annotations

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

import test_uncertainty as h  # noqa: E402 — the single source of the harness

# Reference palette (dataviz skill, light mode): categorical slots 1-2 +
# chart chrome.  Identity: clear bags = blue, ambiguous = orange.
BLUE = "#2a78d6"
ORANGE = "#eb6834"
INK = "#0b0b0b"
INK2 = "#52514e"
MUTED = "#898781"
GRID = "#e1e0d9"
SURFACE = "#fcfcfb"


def _style(ax, title):
    ax.set_facecolor(SURFACE)
    ax.set_title(title, fontsize=10, color=INK, loc="left")
    ax.tick_params(colors=MUTED, labelsize=8)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#c3c2b7")
    ax.grid(axis="y", color=GRID, linewidth=0.7)
    ax.set_axisbelow(True)


def _strip(ax, groups, colors, ylabel):
    """Jittered dot strip per group with a mean tick + direct label."""
    rng = np.random.default_rng(7)
    for i, (name, vals, color) in enumerate(groups):
        x = i + rng.uniform(-0.12, 0.12, len(vals))
        ax.plot(x, vals, "o", ms=5, color=color, mec=SURFACE, mew=0.8, alpha=0.9)
        m = float(np.mean(vals))
        ax.hlines(m, i - 0.24, i + 0.24, color=color, linewidth=2)
        ax.annotate(
            f"{m:.3f}", (i + 0.28, m), fontsize=8, color=INK2, va="center"
        )
    ax.set_xticks(range(len(groups)))
    ax.set_xticklabels([g[0] for g in groups], fontsize=8, color=INK2)
    ax.set_xlim(-0.5, len(groups) - 0.2)
    ax.set_ylabel(ylabel, fontsize=8, color=INK2)


def main() -> None:
    print("training the toy model (CPU, deterministic)...")
    model, params, accs = h.trained_model()
    print(f"  train accuracy by epoch: {[f'{a:.2f}' for a in accs]}")
    assert accs[-1] >= 0.85, "toy training failed — figure would be meaningless"

    clear_neg, clear_pos, ambig = [], [], []
    for i in range(8):
        bag, _ = h.make_bag(2000 + i, positive=i % 2 == 0)
        p1, std1, ent, _ = h.mc_stats(model, params, bag, seed=i)
        (clear_pos if i % 2 == 0 else clear_neg).append((p1, std1, ent))
    for i in range(8):
        bag, _ = h.make_bag(3000 + i, positive=True, amp=0.28)
        p1, std1, ent, _ = h.mc_stats(model, params, bag, seed=100 + i)
        ambig.append((p1, std1, ent))

    mass, lesion_std, bg_std = [], [], []
    for i in range(8):
        bag, lesion = h.make_bag(4000 + i, positive=True)
        _, _, _, A = h.mc_stats(model, params, bag, seed=200 + i)
        a_mean = A[:, 1, :].mean(axis=0)
        mass.append(float(a_mean[lesion].sum()))
        a_std = A[:, 1, :].std(axis=0, ddof=1)
        lesion_std.append(float(a_std[lesion].mean()))
        bg_std.append(float(a_std[~lesion].mean()))

    fig, axes = plt.subplots(1, 4, figsize=(12.5, 3.2), facecolor=SURFACE)
    ax_a, ax_b, ax_c, ax_d = axes

    groups_std = [
        ("clear\nnegative", [v[1] for v in clear_neg], BLUE),
        ("clear\npositive", [v[1] for v in clear_pos], BLUE),
        ("ambiguous", [v[1] for v in ambig], ORANGE),
    ]
    _strip(ax_a, groups_std, None, "MC std of p(malignant), ddof=0")
    _style(ax_a, "A  Predictive MC spread")

    groups_ent = [
        ("clear\nnegative", [v[2] for v in clear_neg], BLUE),
        ("clear\npositive", [v[2] for v in clear_pos], BLUE),
        ("ambiguous", [v[2] for v in ambig], ORANGE),
    ]
    _strip(ax_b, groups_ent, None, "entropy of mean softmax (nats)")
    _style(ax_b, "B  Predictive entropy")

    # C: attention mass on lesion tiles per clear-positive bag vs uniform
    uniform = h.N_LESION / h.N_TILES
    x = np.arange(len(mass))
    ax_c.bar(x, mass, width=0.55, color=BLUE, edgecolor=SURFACE, linewidth=1)
    ax_c.axhline(uniform, color=MUTED, linestyle=(0, (4, 3)), linewidth=1.2)
    ax_c.annotate(
        f"uniform share ({h.N_LESION}/{h.N_TILES})",
        (len(mass) - 0.4, uniform),
        fontsize=8, color=INK2, va="bottom", ha="right",
    )
    ax_c.set_xticks(x)
    ax_c.set_xticklabels([str(i + 1) for i in x], fontsize=8, color=INK2)
    ax_c.set_xlabel("clear positive bag", fontsize=8, color=INK2)
    ax_c.set_ylabel("attention mass on lesion tiles", fontsize=8, color=INK2)
    _style(ax_c, "C  Attention finds the lesions")

    # D: paired MC attention std — background vs lesion tiles, per bag
    for i, (b, l) in enumerate(zip(bg_std, lesion_std)):
        ax_d.plot([0, 1], [b, l], "-", color=GRID, linewidth=1, zorder=1)
        ax_d.plot(0, b, "o", ms=5, color=BLUE, mec=SURFACE, mew=0.8, zorder=2)
        ax_d.plot(1, l, "o", ms=5, color=ORANGE, mec=SURFACE, mew=0.8, zorder=2)
    ax_d.set_xticks([0, 1])
    ax_d.set_xticklabels(["background\ntiles", "lesion\ntiles"], fontsize=8,
                         color=INK2)
    ax_d.set_xlim(-0.4, 1.4)
    ax_d.set_ylabel("MC attention std (ddof=1 over T)", fontsize=8, color=INK2)
    _style(ax_d, "D  MC spread concentrates on lesions")

    fig.suptitle(
        "MC-dropout uncertainty is informative (synthetic lesion bags, "
        f"T={h.T}; tests/test_uncertainty.py)",
        fontsize=11, color=INK, x=0.01, ha="left",
    )
    fig.tight_layout(rect=(0, 0, 1, 0.92))
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "uncertainty_validation.png",
    )
    fig.savefig(out, dpi=160, facecolor=SURFACE, bbox_inches="tight")
    print(f"wrote {out}")

    c_std = float(np.mean([v[1] for v in clear_neg + clear_pos]))
    a_std = float(np.mean([v[1] for v in ambig]))
    c_ent = float(np.mean([v[2] for v in clear_neg + clear_pos]))
    a_ent = float(np.mean([v[2] for v in ambig]))
    print(f"MC std: clear {c_std:.4f} vs ambiguous {a_std:.4f} "
          f"({a_std / c_std:.1f}x)")
    print(f"entropy: clear {c_ent:.4f} vs ambiguous {a_ent:.4f} "
          f"({a_ent / c_ent:.1f}x)")
    print(f"attention mass on lesion tiles: {np.mean(mass):.3f} "
          f"(uniform {uniform:.3f}, {np.mean(mass) / uniform:.1f}x)")
    print(f"attention MC std lesion/background: "
          f"{np.mean(lesion_std) / np.mean(bg_std):.2f}x")


if __name__ == "__main__":
    main()
