"""Stage-2 GM-UNet trainer CLI (reference scripts/stage2/train_gm_unet.py,
same flag surface; SURVEY.md C11).

Pipeline: parquet metadata (columns sdr/gainmap/text) → paired host
transforms → jitted train step (VAE-encode both, ε-prediction MSE on the GM
latents, AdamW, EMA) data-parallel over a ``data`` mesh → orbax checkpoints →
periodic validation through the single-UNet GM pipeline (PNDM, 49 steps,
reference log_validation :159-285) → final save as a complete pipeline dir.

Flags parsed but inert in the reference are IMPLEMENTED here where they are
real features (--snr_gamma, min-SNR weighting) and rejected loudly where they
were dead (--dream_training, --use_x0_conditioning) instead of silently
ignored — SURVEY.md §5.6.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import time

logger = logging.getLogger("gmdx.stage2")


def parse_args():
    p = argparse.ArgumentParser(description="Stage-2 GM-UNet training.")
    # data
    p.add_argument("--dataset_name", type=str, default=None)
    p.add_argument("--dataset_config_name", type=str, default=None)
    p.add_argument("--dataset_cache_dir", type=str, default=None)
    p.add_argument("--cache_dir", type=str, default=None)
    p.add_argument("--train_data_dir", type=str, default=None)
    p.add_argument("--train_metadata", type=str, default=None,
                   help="parquet file(s) with columns sdr/gainmap/text")
    p.add_argument("--image_column", type=str, default="sdr")
    p.add_argument("--caption_column", type=str, default="text")
    p.add_argument("--max_train_samples", type=int, default=None)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--center_crop", action="store_true")
    p.add_argument("--random_flip", action="store_true")
    p.add_argument("--dataloader_num_workers", type=int, default=4)
    # model
    p.add_argument("--pretrained_model_name_or_path", type=str, required=True,
                   help="gmdx pipeline dir with unet/vae/text_encoder/tokenizer")
    p.add_argument("--revision", type=str, default=None)
    p.add_argument("--variant", type=str, default=None)
    p.add_argument("--non_ema_revision", type=str, default=None)
    p.add_argument("--scheduler_config", type=str, default=None,
                   help="override scheduler config dir for validation")
    # training
    p.add_argument("--output_dir", type=str, default="gm-unet-model")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--train_batch_size", type=int, default=16)
    p.add_argument("--num_train_epochs", type=int, default=100)
    p.add_argument("--max_train_steps", type=int, default=None)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--gradient_checkpointing", action="store_true")
    p.add_argument(
        "--shard_strategy",
        choices=["ddp", "zero1", "fsdp", "tp", "sp"],
        default="ddp",
        help="ddp: replicated params+opt (reference DDP equivalent); "
        "zero1: optimizer state sharded over the data axis; fsdp: params "
        "AND optimizer state sharded (ZeRO-3), weights all-gathered at use; "
        "tp: Megatron-style tensor parallelism over a data×model mesh "
        "(gmdx.dist.tp); sp: spatial parallelism — image H sharded over "
        "the model axis, GSPMD halo exchanges (both new capabilities, no "
        "reference equivalent).",
    )
    p.add_argument(
        "--tp_size", type=int, default=2,
        help="model-axis size for --shard_strategy tp (must divide the "
        "device count; SD-1.5 head count limits useful values to 2/4/8).",
    )
    p.add_argument(
        "--sp_size", type=int, default=2,
        help="spatial-group size for --shard_strategy sp (chips cooperating "
        "on one image's rows; must divide the device count).",
    )
    p.add_argument(
        "--cache_latents",
        action="store_true",
        help="Precompute the frozen VAE's posterior (mean, std) for every "
        "sample once and train from cached latents — the per-step posterior "
        "sampling stays on device so the training distribution is unchanged. "
        "The two 512^2 VAE encodes are ~46%% of the device step "
        "(BENCHNOTES.md). Requires --center_crop and no --random_flip "
        "(latents are cached for one deterministic preprocess).",
    )
    p.add_argument(
        "--latent_cache_path", type=str, default=None,
        help="precomputed latent-cache .npz (scripts/tools/"
        "precompute_latents.py) to load for --cache_latents instead of "
        "rebuilding the cache in-process",
    )
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--scale_lr", action="store_true")
    p.add_argument("--lr_scheduler", type=str, default="constant")
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--snr_gamma", type=float, default=None)
    p.add_argument("--dream_training", action="store_true")
    p.add_argument("--dream_detail_preservation", type=float, default=1.0)
    p.add_argument("--use_x0_conditioning", action="store_true")
    p.add_argument("--use_8bit_adam", action="store_true")
    p.add_argument("--allow_tf32", action="store_true")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--offload_ema", action="store_true")
    p.add_argument("--foreach_ema", action="store_true")
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_weight_decay", type=float, default=1e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--prediction_type", type=str, default=None)
    p.add_argument("--noise_offset", type=float, default=0.0)
    p.add_argument("--input_perturbation", type=float, default=0.0)
    p.add_argument("--mixed_precision", type=str, default=None,
                   choices=[None, "no", "fp16", "bf16"])
    p.add_argument("--enable_xformers_memory_efficient_attention",
                   action="store_true")
    # logging / checkpoints / validation
    p.add_argument("--logging_dir", type=str, default="logs")
    p.add_argument("--report_to", type=str, default="tensorboard")
    p.add_argument("--tracker_project_name", type=str, default="gmdx-stage2")
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument(
        "--async_checkpointing", action="store_true",
        help="orbax async saves: the train loop blocks only for the "
        "device->host copy; the disk write streams on a background thread "
        "(atomic commit — a kill mid-write cannot corrupt resume). The "
        "reference's accelerate.save_state is fully synchronous.",
    )
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--validation_prompts", type=str, default=None, nargs="+")
    p.add_argument("--validation_prompt_file", type=str, default=None)
    p.add_argument("--validation_image_dir", type=str, default=None)
    p.add_argument("--validation_epochs", type=int, default=5)
    p.add_argument("--push_to_hub", action="store_true")
    p.add_argument("--hub_token", type=str, default=None)
    p.add_argument("--hub_model_id", type=str, default=None)
    p.add_argument("--local_rank", type=int,
                   default=int(os.environ.get("LOCAL_RANK", -1)))
    args = p.parse_args()

    if args.dream_training or args.use_x0_conditioning:
        # Dead flags in the reference (parsed, never used in the loss path —
        # train_gm_unet.py:431-510 vs :1192). Reject instead of silently no-op.
        p.error(
            "--dream_training/--use_x0_conditioning are not implemented "
            "(they are dead flags in the reference, SURVEY.md C11)"
        )
    if args.train_metadata is None and args.dataset_name is None:
        p.error("need --train_metadata (parquet) or --dataset_name")
    if args.latent_cache_path and not args.cache_latents:
        args.cache_latents = True  # the path implies the cached path
    if args.cache_latents and (args.random_flip or not args.center_crop):
        # Applies to the precomputed-cache path too: a cache built by
        # precompute_latents.py holds center-crop/no-flip latents, so
        # --random_flip with --latent_cache_path would be silently ignored
        # rather than applied. Validate at parse time, BEFORE any output
        # dirs are created, so failed invocations leave no artifacts.
        p.error(
            "--cache_latents/--latent_cache_path require --center_crop and "
            "no --random_flip (latents are cached for one deterministic "
            "preprocess per sample)"
        )
    if args.push_to_hub:
        # Reject loudly rather than parse-and-ignore: this build has no
        # network egress, so silently skipping the reference's upload
        # (create_repo + upload_folder) would misreport success.
        p.error(
            "--push_to_hub is not supported (no network egress in this "
            "build); final artifacts are written to --output_dir — upload "
            "them out-of-band"
        )
    return args


def log_validation(args, pipe, params, step, val_dir, metrics_log=None):
    """Reference log_validation (:159-285): PNDM 49 steps per prompt + SDR
    image, decode GM, reconstruct HDR, save previews; grids also go to the
    tracker (tensorboard/wandb) like the reference's image logging
    (:264-279)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gmdx.io import load_image, save_hdr_image, save_image, to_model_input
    from gmdx.ops import apply_gm_to_sdr

    os.makedirs(val_dir, exist_ok=True)
    prompts = args.validation_prompts or ["high dynamic range photograph"]
    import glob as _glob

    images = (
        sorted(_glob.glob(os.path.join(args.validation_image_dir, "*.png")))
        if args.validation_image_dir
        else []
    )
    if not images:
        logger.info("validation: no images, skipping")
        return
    key = jax.random.key(args.seed or 0)
    for i, img_path in enumerate(images[:4]):
        sdr01 = load_image(img_path, size=(args.resolution, args.resolution))
        sdr_in = jnp.asarray(to_model_input(sdr01))
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        sdr_latent = pipe.encode_sdr(params, sdr_in, k1)
        gm_latent = pipe(
            params, sdr_latent, prompts[i % len(prompts)], key=k2,
            num_inference_steps=49, output_type="latent",
        )
        gm01 = np.clip(
            np.asarray(pipe.decode_latents(params, gm_latent)[0]) / 2 + 0.5, 0, 1
        )
        name = f"step{step}_{i}"
        save_image(os.path.join(val_dir, f"gm_{name}.png"), gm01.transpose(1, 2, 0))
        hdr = np.asarray(
            apply_gm_to_sdr(
                jnp.asarray(gm01),
                jnp.asarray(sdr01.transpose(2, 0, 1)),
                qmax=49.0,
            )
        )
        save_hdr_image(
            os.path.join(val_dir, f"hdr_{name}.hdr"), hdr.transpose(1, 2, 0),
            qmax=49.0,
        )
        if metrics_log is not None:
            metrics_log.log_images(
                step, {f"validation/gm_{i}": gm01.transpose(1, 2, 0)}
            )
    logger.info("validation images written to %s", val_dir)


def build_latent_cache(dataset, tokenizer, vae, vae_params, args, batch_size):
    """Latent cache for --cache_latents: loads --latent_cache_path when
    given (precomputed by scripts/tools/precompute_latents.py — the decode
    AND encode passes are skipped entirely), else one in-RAM pass
    (gmdx/train/latent_cache.py)."""
    from gmdx.train.latent_cache import (
        compute_latent_cache,
        latent_cache_fingerprint,
        load_latent_cache,
    )

    if args.latent_cache_path:
        cache = load_latent_cache(
            args.latent_cache_path, resolution=args.resolution,
            fingerprint=latent_cache_fingerprint(
                args.train_metadata, len(dataset), vae_params
            ),
        )
        if args.max_train_samples:
            cache = {
                k: v[: args.max_train_samples] for k, v in cache.items()
            }
        logger.info(
            "loaded precomputed latent cache (%d samples) from %s",
            cache["input_ids"].shape[0], args.latent_cache_path,
        )
        return cache
    return compute_latent_cache(
        dataset, tokenizer, vae, vae_params,
        resolution=args.resolution,
        enc_batch=min(16, max(1, batch_size)),
        num_workers=args.dataloader_num_workers,
        max_samples=args.max_train_samples,
    )


def cached_latent_loader(
    cache, batch_size, seed=0, num_epochs=None, skip_batches=0
):
    """Shuffled epochs over the latent cache; drops the ragged tail batch
    (static shapes for jit), like make_dataloader. ``skip_batches``:
    deterministic resume fast-forward — the shuffle is epoch-seed-derived,
    so skipping yields the exact stream an uninterrupted run would see."""
    import numpy as np

    n = next(iter(cache.values())).shape[0]
    if n < batch_size:
        raise ValueError(f"cache ({n}) smaller than batch size ({batch_size})")
    epoch = 0
    while num_epochs is None or epoch < num_epochs:
        order = np.random.default_rng(seed + epoch).permutation(n)
        for start in range(0, n - batch_size + 1, batch_size):
            if skip_batches > 0:
                skip_batches -= 1
                continue
            idx = order[start : start + batch_size]
            yield {k: v[idx] for k, v in cache.items()}
        epoch += 1


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gmdx.data import ParquetImageDataset, make_dataloader
    from gmdx.dist import initialize as dist_initialize
    from gmdx.dist import make_mesh, replicate

    dist_initialize()  # no-op single-host; joins the pod slice otherwise
    from gmdx.utils import enable_compilation_cache

    enable_compilation_cache()  # default-on persistent compile cache

    from gmdx.io.pipeline import load_pipeline, save_pipeline
    from gmdx.models import inflate_conv_in
    from gmdx.pipelines import StableDiffusionGMPipeline
    from gmdx.schedulers import DDPMScheduler, PNDMScheduler
    from gmdx.train import (
        Stage2Config,
        init_state,
        make_manager,
        make_optimizer,
        make_stage2_ema_step,
        make_train_step,
        resolve_resume_step,
        restore_state,
        save_state,
    )
    from gmdx.train.metrics import MetricsLogger

    if args.seed is not None:
        np.random.seed(args.seed)

    bundle = load_pipeline(args.pretrained_model_name_or_path)
    unet = bundle["modules"]["unet"]
    unet_params = bundle["params"]["unet"]
    vae = bundle["modules"]["vae"]
    text = bundle["modules"]["text_encoder"]
    tokenizer = bundle["tokenizer"]

    # Inflate a vanilla 4-ch UNet to the 8-ch GM UNet (reference
    # _replace_unet_conv_in, train_gm_unet.py:658-677).
    if unet.config.in_channels == 4:
        from gmdx.models import UNet2DConditionModel

        unet = UNet2DConditionModel(
            dataclasses.replace(unet.config, in_channels=8)
        )
        unet_params = inflate_conv_in(unet_params, 8, scale=0.5)
        logger.info("inflated conv_in 4 -> 8 channels")
    if args.gradient_checkpointing:
        from gmdx.models import UNet2DConditionModel

        unet = UNet2DConditionModel(
            dataclasses.replace(unet.config, remat=True)
        )
        logger.info("gradient checkpointing (remat) enabled")

    frozen = {
        "vae": bundle["params"]["vae"],
        "text_encoder": bundle["params"]["text_encoder"],
    }

    lr = args.learning_rate
    from gmdx.dist import make_train_mesh

    mesh = make_train_mesh(
        args.shard_strategy,
        args.sp_size if args.shard_strategy == "sp" else args.tp_size,
    )
    # batch scaling follows the DATA axis: under tp each model-shard group
    # of tp_size chips processes one per-device batch jointly.
    n_dev = mesh.shape["data"]
    if args.scale_lr:
        lr = lr * args.gradient_accumulation_steps * args.train_batch_size * n_dev

    dataset = ParquetImageDataset(args.train_metadata)
    n_samples = (
        len(dataset) if args.max_train_samples is None
        else min(args.max_train_samples, len(dataset))
    )
    ga = args.gradient_accumulation_steps
    batches_per_epoch = max(
        1, n_samples // (args.train_batch_size * max(1, n_dev))
    )
    # num_update_steps_per_epoch = ceil(len(dataloader) / grad_accum)
    # (train_gm_unet.py:1066) — max_train_steps counts optimizer UPDATES,
    # the reference's sync-gated global_step unit (:1219).
    steps_per_epoch = max(1, -(-batches_per_epoch // ga))
    max_train_steps = args.max_train_steps or (
        args.num_train_epochs * steps_per_epoch
    )

    cfg = Stage2Config(
        learning_rate=lr,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        lr_scheduler=args.lr_scheduler,
        lr_warmup_steps=args.lr_warmup_steps,
        max_train_steps=max_train_steps,
        adam_beta1=args.adam_beta1,
        adam_beta2=args.adam_beta2,
        adam_weight_decay=args.adam_weight_decay,
        adam_epsilon=args.adam_epsilon,
        max_grad_norm=args.max_grad_norm,
        noise_offset=args.noise_offset,
        input_perturbation=args.input_perturbation,
        snr_gamma=args.snr_gamma,
        use_8bit_adam=args.use_8bit_adam,
        prediction_type=args.prediction_type or "epsilon",
        use_ema=args.use_ema,
        weight_dtype={"bf16": jnp.bfloat16, "fp16": jnp.float16}.get(
            args.mixed_precision, jnp.float32
        ),
    )
    optimizer = make_optimizer(cfg)
    state = init_state(cfg, unet_params, optimizer)
    train_step = make_train_step(
        cfg, unet=unet, vae=vae, text_encoder=text,
        noise_scheduler=DDPMScheduler(), optimizer=optimizer,
    )
    ema_step = make_stage2_ema_step(cfg) if args.use_ema else None

    manager = make_manager(
        args.output_dir, max_to_keep=args.checkpoints_total_limit,
        async_checkpointing=args.async_checkpointing,
    )
    global_step = 0
    resume_step = resolve_resume_step(args.output_dir, args.resume_from_checkpoint)
    if resume_step is not None:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
        )
        state = restore_state(manager, resume_step, abstract)
        global_step = resume_step
        logger.info("resumed from checkpoint step %d", resume_step)
    elif args.resume_from_checkpoint:
        logger.warning(
            "checkpoint '%s' does not exist. starting a new training run",
            args.resume_from_checkpoint,
        )

    global_bs = args.train_batch_size * n_dev
    # Resume fast-forward: global_step counts optimizer UPDATES and
    # checkpoints land on sync boundaries, so a checkpoint at step S has
    # consumed exactly S*ga dataloader batches. Skipping them (and starting
    # the batch index there, below) makes the resumed stream — data order,
    # RNG keys, sync phase — bit-identical to an uninterrupted run. Beats
    # the reference, which only resumes the epoch loop at first_epoch and
    # re-consumes the partial epoch (train_gm_unet.py:1122-1129).
    consumed_batches = global_step * ga
    if args.cache_latents:
        cache = build_latent_cache(
            dataset, tokenizer, vae, bundle["params"]["vae"], args, global_bs
        )
        loader = cached_latent_loader(
            cache, global_bs, seed=args.seed or 0,
            skip_batches=consumed_batches,
        )
    else:
        loader = make_dataloader(
            dataset,
            tokenizer,
            batch_size=global_bs,
            resolution=args.resolution,
            center_crop=args.center_crop,
            random_flip=args.random_flip,
            seed=args.seed or 0,
            num_workers=args.dataloader_num_workers,
            max_samples=args.max_train_samples,
            # Resume fast-forward (see consumed_batches note above).
            skip_batches=consumed_batches,
            # Multi-host: each host decodes only its own rows of the global
            # batch (seed-derived order, no cross-host coordination) and the
            # prefetcher assembles the global array process-locally below.
            # sp keeps the global path: its leaves are H-sharded across
            # processes, not row-sliced.
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
        "***** Running training ***** steps=%d batch=%dx%d",
        max_train_steps, args.train_batch_size, n_dev,
    )
    key = jax.random.key(args.seed or 0)
    t_last = time.time()
    window_loss = []

    def host_batches():
        for batch in loader:
            if args.cache_latents:
                yield batch  # latent stats + input_ids
            else:
                yield {
                    "sdr": batch["pixel_values"],
                    "gm": batch["gainmap_values"],
                    "input_ids": batch["input_ids"],
                }

    from gmdx.data import device_prefetch

    # H2D copies run ahead on a background thread so the step dequeues
    # device-resident batches (gmdx/data/prefetch.py). Under sp the image
    # leaves land batch+H sharded and GSPMD propagates the spatial split.
    # process_local matches the loader: the parquet path yields per-host
    # rows (process_shard above); the latent cache yields global batches.
    # start=consumed_batches: i is the GLOBAL dataloader index, so the
    # sync-boundary phase and the fold_in key stream continue where an
    # interrupted run left off.
    for i, dev_batch in enumerate(
        device_prefetch(
            host_batches(), mesh, spatial=(args.shard_strategy == "sp"),
            process_local=(
                args.shard_strategy != "sp" and not args.cache_latents
            ),
        ),
        start=consumed_batches,
    ):
        if global_step >= max_train_steps:
            break
        # fold_in(key, batch index), not a split chain: O(1) resume
        # fast-forward — a run resumed at step S draws the same
        # noise/timesteps its micro-batches would have seen uninterrupted
        # (pairs with the loader skip above).
        k_step = jax.random.fold_in(key, i)
        state, m = train_step(state, frozen_dev, dev_batch, k_step)
        # The reference's logged train_loss is the window mean
        # (train_gm_unet.py:1200: train_loss += avg_loss/ga, reset at sync).
        # Device scalars are collected lazily; float() only on the log
        # cadence so accumulation never blocks dispatch.
        window_loss.append(m["loss"])
        # Optimizer sync boundary: with accumulation the micro-steps between
        # syncs emit zero updates (MultiSteps) and the reference neither
        # advances global_step, steps EMA, logs, nor checkpoints there
        # (train_gm_unet.py:1210-1248, `if accelerator.sync_gradients`).
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
            scalars = {"train_loss": loss, "grad_norm": float(m["grad_norm"]),
                       "samples_per_sec": sps}
            scalars.update({
                f"grad_norm/{k}": float(v)
                for k, v in m["module_grad_norms"].items()
            })
            metrics_log.log(global_step, scalars)
            logger.info(
                "step %d loss %.5f grad %.3f %.1f samples/s",
                global_step, loss, float(m["grad_norm"]), sps,
            )
        if global_step % args.checkpointing_steps == 0:
            if args.async_checkpointing:
                # Device arrays straight to orbax: it copies them off-device
                # (safe vs the next step's donation) and writes in the
                # background — no blocking host gather.
                save_state(manager, global_step, state, wait=False)
            else:
                save_state(manager, global_step, jax.device_get(state))
            logger.info("saved state to checkpoint-%d", global_step)
        if (
            args.validation_image_dir
            and global_step % (args.validation_epochs * steps_per_epoch) == 0
        ):
            host_state = jax.device_get(state)
            pipe = StableDiffusionGMPipeline(
                unet, vae, text, tokenizer, PNDMScheduler()
            )
            val_params = {
                "unet": (
                    host_state.ema.shadow if host_state.ema is not None
                    else host_state.params
                ),
                **frozen,
            }
            log_validation(
                args, pipe, val_params, global_step,
                os.path.join(args.output_dir, "validation"),
                metrics_log=metrics_log,
            )

    # Final save as a complete GM pipeline (reference :1277-1295).
    manager.wait_until_finished()  # drain any in-flight async checkpoint
    host_state = jax.device_get(state)
    final_unet_params = (
        host_state.ema.shadow if host_state.ema is not None else host_state.params
    )
    save_pipeline(
        os.path.join(args.output_dir, "save_pipeline"),
        components={
            "unet": (unet, final_unet_params),
            "vae": (vae, frozen["vae"]),
            "text_encoder": (text, frozen["text_encoder"]),
        },
        tokenizer=tokenizer,
        scheduler=PNDMScheduler(),
    )
    metrics_log.close()
    logger.info("training complete; pipeline saved to %s/save_pipeline",
                args.output_dir)


if __name__ == "__main__":
    main()
