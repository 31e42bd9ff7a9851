"""C18 rebuttal_visual: 2-row SDR/GM denoising-trajectory grid (<=8 frames).

Reference: scripts/inference/experiments/rebuttal_visual.py:229 (drives the
Vis pipeline with return_intermediates=True, decodes intermediate latents,
and assembles a 2-row SDR-over-GM grid, :184-227, :352-366). The gmdx
implementation of that functionality lives in visualize_latents.py (the Vis
subclass and this harness were merged — the dual pipeline captures
intermediates inside its scan); this file keeps the reference's harness name
as a thin delegate so `python rebuttal_visual.py` keeps working.
"""

from visualize_latents import main

if __name__ == "__main__":
    main()
