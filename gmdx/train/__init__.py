"""Training stack: fused jitted train steps, optax optimizers, EMA, orbax
checkpoints (replaces the reference's accelerate/peft/diffusers-training
plumbing — SURVEY.md §7.2 steps 7-8)."""

from gmdx.train.ema import EMAConfig, EMAState, ema_init, ema_update
from gmdx.train.optim import get_lr_schedule, make_adamw
from gmdx.train.checkpoint import (
    make_manager,
    save_state,
    restore_state,
    resolve_resume_step,
)
from gmdx.train.stage2 import (
    Stage2Config,
    Stage2State,
    make_optimizer,
    init_state,
    stage2_loss,
    make_train_step,
)
from gmdx.train.stage2 import make_ema_step as make_stage2_ema_step
from gmdx.train.controlnet import (
    ControlNetState,
    ControlNetTrainConfig,
    init_controlnet_state,
    make_controlnet_train_step,
    make_controlnet_ema_step,
)
from gmdx.train.stage1 import (
    Stage1Config,
    Stage1State,
    init_trainables,
    effective_vae_params,
    gm_forward,
    reconstruct_and_tonemap,
    make_gen_step,
    make_disc_step,
    make_ema_step,
)

__all__ = [
    "EMAConfig",
    "EMAState",
    "ema_init",
    "ema_update",
    "get_lr_schedule",
    "make_adamw",
    "make_manager",
    "save_state",
    "restore_state",
    "resolve_resume_step",
    "Stage2Config",
    "Stage2State",
    "make_optimizer",
    "init_state",
    "stage2_loss",
    "make_train_step",
    "make_stage2_ema_step",
    "Stage1Config",
    "Stage1State",
    "init_trainables",
    "effective_vae_params",
    "gm_forward",
    "reconstruct_and_tonemap",
    "make_gen_step",
    "make_disc_step",
    "make_ema_step",
    "ControlNetTrainConfig",
    "ControlNetState",
    "init_controlnet_state",
    "make_controlnet_train_step",
    "make_controlnet_ema_step",
]
