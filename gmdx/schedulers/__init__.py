"""Functional diffusion schedulers with explicit pytree state.

The reference relies on diffusers' stateful schedulers (DDPM for training
noising, PNDM for Stage-2 validation/Stage-3 inference, DDIM's eta path,
DPM-Solver++ order 2 for the "improved" experiments — SURVEY.md §2.2).
Here every scheduler is a frozen config object whose ``step`` is a pure
function ``(state, model_output, sample) -> (state, prev_sample)`` with
fixed-shape state (PLMS's ets history is a rolled (4, ...) buffer, its
counter a scalar), so whole sampling loops live inside one ``lax.scan``.
"""

from gmdx.schedulers.base import (
    SchedulerConfig,
    make_betas,
    alphas_cumprod_from_config,
    add_noise,
    get_velocity,
)
from gmdx.schedulers.ddpm import DDPMScheduler, DDPMState
from gmdx.schedulers.ddim import DDIMScheduler, DDIMState
from gmdx.schedulers.pndm import PNDMScheduler, PNDMState
from gmdx.schedulers.dpm import DPMSolverMultistepScheduler, DPMState
from gmdx.schedulers.lcm import LCMScheduler, LCMState

SCHEDULERS = {
    "ddpm": DDPMScheduler,
    "ddim": DDIMScheduler,
    "pndm": PNDMScheduler,
    "dpm++": DPMSolverMultistepScheduler,
    "dpmsolver++": DPMSolverMultistepScheduler,
    "lcm": LCMScheduler,
}


def get_scheduler(name: str, **kwargs):
    """Look up a scheduler class by name and instantiate it."""
    try:
        cls = SCHEDULERS[name.lower()]
    except KeyError:
        raise ValueError(f"unknown scheduler '{name}'; have {sorted(SCHEDULERS)}")
    return cls(**kwargs)


__all__ = [
    "SchedulerConfig",
    "make_betas",
    "alphas_cumprod_from_config",
    "add_noise",
    "get_velocity",
    "DDPMScheduler",
    "DDPMState",
    "DDIMScheduler",
    "DDIMState",
    "PNDMScheduler",
    "PNDMState",
    "DPMSolverMultistepScheduler",
    "DPMState",
    "LCMScheduler",
    "LCMState",
    "SCHEDULERS",
    "get_scheduler",
]
