"""C9/C18 visualize_latents + rebuttal_visual: per-step denoising trajectory
grids.

Reference: scripts/inference/experiments/visualize_latents.py (Vis subclass
storing per-step latent clones on CPU, :286-289) and rebuttal_visual.py
(2-row SDR/GM trajectory grid of <=8 steps, :184-227). The gmdx dual pipeline
captures intermediates inside the scan (``return_intermediates=True``), so
this harness just decodes a subsample and assembles the grid.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from _common import load_dual_pipeline


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained_model_name_or_path", required=True)
    p.add_argument("--output_dir", default="latent_vis_outputs")
    p.add_argument("--prompt", default="fireworks over a harbor at night")
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--max_frames", type=int, default=8)
    args = p.parse_args()

    import jax

    from gmdx.io import save_image

    pipe, params = load_dual_pipeline(args.pretrained_model_name_or_path)
    (sdr_lat, gm_lat), inter = pipe(
        params, args.prompt, key=jax.random.key(args.seed),
        height=args.resolution, width=args.resolution,
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale,
        output_type="latent", return_intermediates=True,
    )
    sdr_traj, gm_traj = inter  # (n_steps, B, 4, h, w) each
    n = sdr_traj.shape[0]
    idx = np.linspace(0, n - 1, min(args.max_frames, n)).astype(int)

    def decode(lat):
        img = np.asarray(pipe.decode_latents(params, lat))
        return np.clip(img / 2 + 0.5, 0, 1)[0].transpose(1, 2, 0)

    rows = []
    for traj in (sdr_traj, gm_traj):
        rows.append(np.concatenate([decode(traj[i]) for i in idx], axis=1))
    grid = np.concatenate(rows, axis=0)  # 2 rows: SDR over GM
    os.makedirs(args.output_dir, exist_ok=True)
    out = os.path.join(args.output_dir, "trajectory_grid.png")
    save_image(out, grid)
    print(f"wrote {out} ({len(idx)} frames, steps {list(idx)})")


if __name__ == "__main__":
    main()
