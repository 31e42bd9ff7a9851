"""PSNR parity harness: compare gmdx outputs against reference outputs.

The driver's acceptance gate is HDR PSNR >= 40 dB vs the PyTorch reference
(BASELINE.md). JAX PRNG cannot bit-match torch's normal sampler, so parity
runs inject the SAME initial latents into both implementations (the
reference pipelines accept ``latents=``, stable_diffusion_gm.py:796; gmdx
pipelines accept ``latents=`` too) and compare the decoded outputs here.

Usage:
    python scripts/tools/parity_check.py ref_dir test_dir [--threshold 40]

Compares files with matching names: .hdr via the RGBE decoder (native or
numpy), .png/.jpg via PIL. Prints per-file PSNR + a pass/fail summary line.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def load_any(path: str) -> np.ndarray:
    if path.endswith(".hdr"):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
        from gmdx.io import read_hdr

        return read_hdr(path)
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def psnr(a: np.ndarray, b: np.ndarray, peak: float | None = None) -> float:
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    peak = peak if peak is not None else max(float(a.max()), float(b.max()), 1e-9)
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak**2 / mse)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ref_dir")
    p.add_argument("test_dir")
    p.add_argument("--threshold", type=float, default=40.0)
    p.add_argument("--peak", type=float, default=None,
                   help="fixed PSNR peak (default: per-pair max value)")
    args = p.parse_args()

    names = sorted(
        n for n in os.listdir(args.ref_dir)
        if n.lower().endswith((".hdr", ".png", ".jpg", ".jpeg"))
        and os.path.exists(os.path.join(args.test_dir, n))
    )
    if not names:
        print("no matching files", file=sys.stderr)
        sys.exit(2)

    scores = []
    for n in names:
        a = load_any(os.path.join(args.ref_dir, n))
        b = load_any(os.path.join(args.test_dir, n))
        s = psnr(a, b, args.peak)
        scores.append(s)
        print(f"{n}: {s:.2f} dB")
    worst = min(scores)
    mean = sum(scores) / len(scores)
    ok = worst >= args.threshold
    print(
        f"{'PASS' if ok else 'FAIL'}: {len(names)} files, "
        f"mean {mean:.2f} dB, worst {worst:.2f} dB "
        f"(threshold {args.threshold} dB)"
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
