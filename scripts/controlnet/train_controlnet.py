"""ControlNet trainer CLI for the SDR→HDRTV pipeline.

New capability beyond the reference code (its README mentions ControlNet,
README.md:23,149, but ships no implementation). Trains a ControlNet that
steers the frozen SD UNet's denoising with a full-resolution SDR control
frame — the conditioning used by scripts/inference/upconvert_hdrtv.py.

Data: the same parquet schema as stage 2 (columns sdr/gainmap/text); the
SDR image is both the denoising target and the control signal by default.
The ControlNet initializes from the frozen UNet's encoder weights
(controlnet_params_from_unet) with zero-convs, the standard recipe.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import time

logger = logging.getLogger("gmdx.controlnet")


def parse_args():
    p = argparse.ArgumentParser(description="ControlNet training.")
    p.add_argument("--pretrained_model_name_or_path", type=str, required=True,
                   help="gmdx pipeline dir with unet/vae/text_encoder/tokenizer")
    p.add_argument("--controlnet_ckpt", type=str, default=None,
                   help="resume ControlNet weights from a component dir "
                   "(default: initialize from the UNet encoder)")
    p.add_argument("--train_metadata", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="controlnet-model")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--center_crop", action="store_true")
    p.add_argument("--random_flip", action="store_true")
    p.add_argument("--dataloader_num_workers", type=int, default=4)
    p.add_argument("--max_train_samples", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--train_batch_size", type=int, default=4)
    p.add_argument("--num_train_epochs", type=int, default=100)
    p.add_argument("--max_train_steps", type=int, default=None)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--lr_scheduler", type=str, default="constant")
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--use_8bit_adam", action="store_true")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_weight_decay", type=float, default=1e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--mixed_precision", type=str, default=None,
                   choices=[None, "no", "fp16", "bf16"])
    p.add_argument("--tp_size", type=int, default=2,
                   help="model-axis size for --shard_strategy tp")
    p.add_argument("--sp_size", type=int, default=2,
                   help="spatial-group size for --shard_strategy sp")
    p.add_argument("--shard_strategy",
                   choices=["ddp", "zero1", "fsdp", "tp", "sp"],
                   default="ddp")
    p.add_argument("--logging_dir", type=str, default="logs")
    p.add_argument("--report_to", type=str, default="tensorboard")
    p.add_argument("--tracker_project_name", type=str,
                   default="gmdx-controlnet")
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument(
        "--async_checkpointing", action="store_true",
        help="orbax async saves: the loop blocks only for the device->host "
        "copy; the write streams in the background (atomic commit).",
    )
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)
    os.makedirs(args.output_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gmdx.data import ParquetImageDataset, device_prefetch, make_dataloader
    from gmdx.dist import initialize as dist_initialize
    from gmdx.dist import make_mesh, replicate

    dist_initialize()
    from gmdx.utils import enable_compilation_cache

    enable_compilation_cache()  # default-on persistent compile cache

    from gmdx.io.pipeline import load_component, load_pipeline, save_component
    from gmdx.models import (
        SD15_CONTROLNET_CONFIG,
        TINY_CONTROLNET_CONFIG,
        ControlNetModel,
        controlnet_params_from_unet,
    )
    from gmdx.schedulers import DDPMScheduler
    from gmdx.train import (
        ControlNetTrainConfig,
        init_controlnet_state,
        make_controlnet_ema_step,
        make_controlnet_train_step,
        make_manager,
        make_optimizer,
        resolve_resume_step,
        restore_state,
        save_state,
    )
    from gmdx.train.metrics import MetricsLogger

    if args.seed is not None:
        np.random.seed(args.seed)

    bundle = load_pipeline(args.pretrained_model_name_or_path)
    unet = bundle["modules"]["unet"]
    vae = bundle["modules"]["vae"]
    text = bundle["modules"]["text_encoder"]
    tokenizer = bundle["tokenizer"]
    if unet.config.in_channels != 4:
        raise SystemExit(
            "ControlNet conditions the 4-channel SDR UNet; got "
            f"in_channels={unet.config.in_channels} (pass the base pipeline, "
            "not the 8-channel GM UNet)"
        )

    # Size the ControlNet to the UNet (tiny configs in tests, SD-1.5 o/w).
    cn_config = (
        SD15_CONTROLNET_CONFIG
        if unet.config.block_out_channels[0] >= 320
        else dataclasses.replace(TINY_CONTROLNET_CONFIG, unet=unet.config)
    )
    if cn_config.unet.block_out_channels != unet.config.block_out_channels:
        cn_config = dataclasses.replace(cn_config, unet=unet.config)
    controlnet = ControlNetModel(cn_config)

    if args.controlnet_ckpt:
        controlnet, cn_params = load_component(args.controlnet_ckpt)
        logger.info("loaded ControlNet from %s", args.controlnet_ckpt)
    else:
        h = w = args.resolution // 8
        cn_params = jax.jit(controlnet.init)(
            jax.random.key(args.seed or 0),
            jnp.zeros((1, 4, h, w)),
            jnp.array(1.0),
            jnp.zeros((1, 77, unet.config.cross_attention_dim)),
            jnp.zeros((1, 3, args.resolution, args.resolution)),
        )["params"]
        cn_params = controlnet_params_from_unet(
            cn_params, bundle["params"]["unet"]
        )
        logger.info("initialized ControlNet from the UNet encoder")

    frozen = {
        "unet": bundle["params"]["unet"],
        "vae": bundle["params"]["vae"],
        "text_encoder": bundle["params"]["text_encoder"],
    }

    from gmdx.dist import make_train_mesh

    mesh = make_train_mesh(
        args.shard_strategy,
        args.sp_size if args.shard_strategy == "sp" else args.tp_size,
    )
    n_dev = mesh.shape["data"]
    cfg = ControlNetTrainConfig(
        learning_rate=args.learning_rate,
        lr_scheduler=args.lr_scheduler,
        lr_warmup_steps=args.lr_warmup_steps,
        max_train_steps=args.max_train_steps,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        adam_beta1=args.adam_beta1,
        adam_beta2=args.adam_beta2,
        adam_weight_decay=args.adam_weight_decay,
        adam_epsilon=args.adam_epsilon,
        max_grad_norm=args.max_grad_norm,
        use_8bit_adam=args.use_8bit_adam,
        use_ema=args.use_ema,
        weight_dtype={"bf16": jnp.bfloat16, "fp16": jnp.float16}.get(
            args.mixed_precision, jnp.float32
        ),
    )
    optimizer = make_optimizer(cfg)
    state = init_controlnet_state(cfg, cn_params, optimizer)
    train_step = make_controlnet_train_step(
        cfg, unet=unet, vae=vae, text_encoder=text, controlnet=controlnet,
        noise_scheduler=DDPMScheduler(), optimizer=optimizer,
    )
    ema_step = make_controlnet_ema_step(cfg) if args.use_ema else None

    manager = make_manager(
        args.output_dir, max_to_keep=args.checkpoints_total_limit,
        async_checkpointing=args.async_checkpointing,
    )
    global_step = 0
    resume_step = resolve_resume_step(
        args.output_dir, args.resume_from_checkpoint
    )
    if resume_step is not None:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
        )
        state = restore_state(manager, resume_step, abstract)
        global_step = resume_step
        logger.info("resumed from checkpoint step %d", resume_step)

    dataset = ParquetImageDataset(args.train_metadata)
    n_samples = (
        len(dataset) if args.max_train_samples is None
        else min(args.max_train_samples, len(dataset))
    )
    ga = args.gradient_accumulation_steps
    batches_per_epoch = max(
        1, n_samples // (args.train_batch_size * max(1, n_dev))
    )
    # max_train_steps counts optimizer UPDATES (sync-gated global_step),
    # same accumulation semantics as the stage-2 trainer.
    steps_per_epoch = max(1, -(-batches_per_epoch // ga))
    max_train_steps = args.max_train_steps or (
        args.num_train_epochs * steps_per_epoch
    )
    # Resume fast-forward: a checkpoint at update S has consumed S*ga
    # batches; skipping them + the fold_in(key, i) stream below makes the
    # resumed trajectory identical to an uninterrupted run.
    consumed_batches = global_step * ga
    loader = make_dataloader(
        dataset, tokenizer,
        batch_size=args.train_batch_size * n_dev,
        resolution=args.resolution,
        center_crop=args.center_crop,
        random_flip=args.random_flip,
        seed=args.seed or 0,
        num_workers=args.dataloader_num_workers,
        max_samples=args.max_train_samples,
        skip_batches=consumed_batches,
        # Multi-host: per-host rows, assembled process-locally in the
        # prefetcher (sp keeps the global path — H-sharded leaves).
        process_shard=(args.shard_strategy != "sp"),
    )

    from gmdx.dist import apply_shard_strategy

    state = apply_shard_strategy(
        mesh, state, args.shard_strategy,
        param_fields=("params", "ema"), opt_fields=("opt_state",),
    )
    frozen_dev = replicate(mesh, frozen)
    metrics_log = MetricsLogger(
        os.path.join(args.output_dir, args.logging_dir),
        backend=args.report_to,
        project=args.tracker_project_name,
        config=vars(args),
    )

    logger.info(
        "***** ControlNet training ***** steps=%d batch=%dx%d",
        max_train_steps, args.train_batch_size, n_dev,
    )
    key = jax.random.key(args.seed or 0)
    t_last = time.time()
    window_loss = []

    def host_batches():
        for batch in loader:
            # Target = control = the SDR frame (SDR→HDRTV recipe).
            yield {
                "image": batch["pixel_values"],
                "cond": batch["pixel_values"],
                "input_ids": batch["input_ids"],
            }

    for i, dev_batch in enumerate(
        device_prefetch(
            host_batches(), mesh, spatial=(args.shard_strategy == "sp"),
            process_local=(args.shard_strategy != "sp"),
        ),
        start=consumed_batches,
    ):
        if global_step >= max_train_steps:
            break
        k_step = jax.random.fold_in(key, i)
        state, m = train_step(state, frozen_dev, dev_batch, k_step)
        window_loss.append(m["loss"])
        # Sync boundary: between syncs MultiSteps emits zero updates and
        # global_step/EMA/logging/checkpointing do not advance (stage-2
        # accumulation semantics).
        if (i + 1) % ga != 0:
            continue
        global_step += 1
        if ema_step is not None:
            state = ema_step(state)
        last_window, window_loss = window_loss, []
        if global_step % 10 == 0 or global_step == 1:
            loss = sum(float(x) for x in last_window) / len(last_window)
            dt = time.time() - t_last
            t_last = time.time()
            sps = (
                10 * ga * args.train_batch_size * n_dev / dt
                if global_step > 1 else 0
            )
            metrics_log.log(global_step, {
                "train_loss": loss,
                "grad_norm": float(m["grad_norm"]),
                "samples_per_sec": sps,
            })
            logger.info("step %d loss %.5f %.1f samples/s",
                        global_step, loss, sps)
        if global_step % args.checkpointing_steps == 0:
            if args.async_checkpointing:
                save_state(manager, global_step, state, wait=False)
            else:
                save_state(manager, global_step, jax.device_get(state))
            logger.info("checkpoint at step %d", global_step)

    metrics_log.close()
    manager.wait_until_finished()
    final = jax.device_get(
        state.ema.shadow if state.ema is not None else state.params
    )
    save_component(
        os.path.join(args.output_dir, "controlnet"),
        controlnet.config, final, "ControlNetModel",
    )
    logger.info("saved ControlNet to %s/controlnet", args.output_dir)


if __name__ == "__main__":
    main()
