"""Generate scheduler trajectory goldens from the torch oracle.

Writes tests/goldens/schedulers/<name>.npz files, each holding:
  x0        — initial sample (1,4,8,8) fp32
  base_eps  — constant used by the deterministic fake model
  noise     — (N,1,4,8,8) injected ancestral noise (stochastic configs only)
  traj      — (N,1,4,8,8) the per-step outputs from the torch scheduler

The fake model ``eps = 0.3*x + sin(0.01*t)*base_eps`` depends on both the
sample and the timestep, so any drift in timestep grids, warmup coefficients
or transfer algebra diverges the trajectory immediately.

The oracle is gmdx.refbridge.torch_schedulers — an independent torch
transcription of the diffusers algorithms (diffusers itself is not
installable here; see docs/PARITY.md for the provenance note). Covered:
PNDM 49/50 (reference validation + inference), DDIM eta 0 / 0.7 (reference
eta path), DDPM 50 (formal_baseline), DPM++ 2M 20/75 (scheduler_tuning /
formal_improved). Reference configs: train_gm_unet.py:171-176,
formal_improved.py:195,259-269, scheduler_tuning.py:190-201.

Deterministic: fixed numpy seeds, no torch RNG.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from gmdx.refbridge import torch_schedulers as TS  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(__file__), "..", "..", "tests", "goldens", "schedulers"
)
SHAPE = (1, 4, 8, 8)


def fake_model(sample: np.ndarray, t: int, base_eps: np.ndarray) -> np.ndarray:
    return 0.3 * sample + np.float32(np.sin(t * 0.01)) * base_eps


def run(sched, steps: int, x0: np.ndarray, base_eps: np.ndarray,
        eta: float | None = None, noise: np.ndarray | None = None):
    sched.set_timesteps(steps)
    x = torch.from_numpy(x0.copy())
    traj = []
    for i, t in enumerate(sched.timesteps):
        eps = torch.from_numpy(fake_model(x.numpy(), int(t), base_eps))
        kw = {}
        if eta is not None:
            kw["eta"] = eta
        if noise is not None:
            kw["variance_noise"] = torch.from_numpy(noise[i].copy())
        x = sched.step(eps, t, x, return_dict=False, **kw)[0]
        traj.append(x.numpy().copy())
    return np.stack(traj)


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    base_eps = rng.standard_normal(SHAPE).astype(np.float32)

    def noise_for(n):
        return rng.standard_normal((n,) + SHAPE).astype(np.float32)

    cases = {
        "pndm_49": (TS.PNDMScheduler(), 49, None, None),
        "pndm_50": (TS.PNDMScheduler(), 50, None, None),
        "ddim_50_eta0": (TS.DDIMScheduler(), 50, 0.0, None),
        "ddim_50_eta07": (TS.DDIMScheduler(), 50, 0.7, noise_for(50)),
        "ddpm_50": (TS.DDPMScheduler(), 50, None, noise_for(50)),
        "dpm_20": (TS.DPMSolverMultistepScheduler(), 20, None, None),
        "dpm_75": (TS.DPMSolverMultistepScheduler(), 75, None, None),
    }
    for name, (sched, steps, eta, noise) in cases.items():
        traj = run(sched, steps, x0, base_eps, eta=eta, noise=noise)
        payload = {"x0": x0, "base_eps": base_eps, "traj": traj,
                   "steps": np.int64(steps)}
        if eta is not None:
            payload["eta"] = np.float64(eta)
        if noise is not None:
            payload["noise"] = noise
        path = os.path.join(OUT_DIR, f"{name}.npz")
        np.savez_compressed(path, **payload)
        print(f"{name}: {traj.shape[0]} steps -> {path}")


if __name__ == "__main__":
    main()
