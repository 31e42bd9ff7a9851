"""Stage-1 VAE-LoRA + GAN trainer CLI (reference scripts/stage1/
train_vqgan_lora.py, same flag surface; SURVEY.md C10).

Alternates generator/discriminator steps keyed by the dataloader index
``(i // grad_accum) % 2`` — the reference's exact cadence (:1114), which
changes what data each branch sees. Generator: recon(L2|L1) + VGG19
perceptual + adaptive-weight adversarial through the Eq.(1)-TMO-gamut chain
at qmax=49; discriminator: hinge + gradient penalty. Optional exposure-clip
augmentation (--clip_pixel, prob 0.7) runs on host before sharding.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import time

logger = logging.getLogger("gmdx.stage1")


def parse_args():
    p = argparse.ArgumentParser(description="Stage-1 VAE-LoRA GAN training.")
    # data
    p.add_argument("--dataset_name", type=str, default=None)
    p.add_argument("--dataset_config_name", type=str, default=None)
    p.add_argument("--dataset_cache_dir", type=str, default=None)
    p.add_argument("--cache_dir", type=str, default=None)
    p.add_argument("--train_data_dir", type=str, default=None)
    p.add_argument("--train_metadata", type=str, default=None)
    p.add_argument("--image_column", type=str, default="sdr")
    p.add_argument("--max_train_samples", type=int, default=None)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--center_crop", action="store_true")
    p.add_argument("--random_flip", action="store_true")
    p.add_argument("--dataloader_num_workers", type=int, default=4)
    # model
    p.add_argument("--pretrained_model_name_or_path", type=str, required=True)
    p.add_argument("--revision", type=str, default=None)
    p.add_argument("--model_config_name_or_path", type=str, default=None)
    p.add_argument("--discriminator_config_name_or_path", type=str, default=None)
    p.add_argument("--non_ema_revision", type=str, default=None)
    # losses / tmo
    p.add_argument("--vae_loss", type=str, default="l2", choices=["l1", "l2"])
    p.add_argument("--bright_tmo", type=str, default="fix_mulog",
                   choices=["fix_mulog", "hard_clip", "linear_scale"])
    p.add_argument("--tmo_2446a", action="store_true")
    p.add_argument("--clip_pixel", action="store_true")
    p.add_argument("--non_zero_loss", action="store_true")
    p.add_argument("--timm_model_backend", type=str, default="vgg19")
    p.add_argument("--timm_model_layers", type=str, default=None)
    p.add_argument("--timm_model_offset", type=int, default=0)
    p.add_argument(
        "--perceptual_ckpt", type=str, default=None,
        help="pretrained VGG19 weights (torchvision/timm layout; "
        ".safetensors/.pth/.pt/.bin). The reference uses a *pretrained* "
        "timm VGG19 (train_vqgan_lora.py:837-863); without this flag the "
        "perceptual term is a random projection and a loud warning is "
        "emitted.",
    )
    # training
    p.add_argument("--output_dir", type=str, default="vqgan-lora-model")
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
        help="ddp: replicated (reference DDP equivalent); zero1: both "
        "optimizer states sharded over the data axis; fsdp: generator "
        "trainables + discriminator params + optimizer states sharded; "
        "tp: tensor parallelism over a data×model mesh (gmdx.dist.tp); "
        "sp: spatial parallelism — image H sharded over the model axis.",
    )
    p.add_argument("--tp_size", type=int, default=2,
                   help="model-axis size for --shard_strategy tp")
    p.add_argument("--sp_size", type=int, default=2,
                   help="spatial-group size for --shard_strategy sp")
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--discr_learning_rate", type=float, default=1e-4)
    p.add_argument("--scale_lr", action="store_true")
    p.add_argument("--lr_scheduler", type=str, default="constant")
    p.add_argument("--discr_lr_scheduler", type=str, default="constant")
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--use_8bit_adam", action="store_true")
    p.add_argument("--allow_tf32", action="store_true")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_weight_decay", type=float, default=1e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--prediction_type", type=str, default=None)
    p.add_argument("--mixed_precision", type=str, default=None,
                   choices=[None, "no", "fp16", "bf16"])
    p.add_argument("--enable_xformers_memory_efficient_attention",
                   action="store_true")
    p.add_argument("--rank", type=int, default=64, dest="lora_rank")
    # logging / checkpoints / validation
    p.add_argument("--logging_dir", type=str, default="logs")
    p.add_argument("--report_to", type=str, default="tensorboard")
    p.add_argument("--tracker_project_name", type=str, default="gmdx-stage1")
    p.add_argument("--log_steps", type=int, default=50)
    p.add_argument("--log_grad_norm_steps", type=int, default=500)
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument(
        "--async_checkpointing", action="store_true",
        help="orbax async saves: the loop blocks only for the device->host "
        "copy; the write streams in the background (atomic commit).",
    )
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--val_images_dir", type=str, default=None)
    p.add_argument("--validation_images", type=str, default=None, nargs="+")
    p.add_argument("--validation_steps", type=int, default=500)
    p.add_argument("--debug_mode", action="store_true")
    p.add_argument("--push_to_hub", action="store_true")
    p.add_argument("--hub_token", type=str, default=None)
    p.add_argument("--hub_model_id", type=str, default=None)
    p.add_argument("--local_rank", type=int,
                   default=int(os.environ.get("LOCAL_RANK", -1)))
    args = p.parse_args()
    if args.train_metadata is None and args.dataset_name is None:
        p.error("need --train_metadata (parquet) or --dataset_name")
    if args.push_to_hub:
        # Reject loudly rather than parse-and-ignore: this build has no
        # network egress, so silently skipping the upload the reference
        # performs (create_repo + upload_folder) would misreport success.
        p.error(
            "--push_to_hub is not supported (no network egress in this "
            "build); final artifacts are written to --output_dir — upload "
            "them out-of-band"
        )
    return args


def choose_tmo(name: str, use_2446a: bool = False):
    """Reference choose_tmo (:734-743): --bright_tmo selects the training TMO.

    ``--tmo_2446a`` overrides it with ITU-R BT.2446-A. The reference parses
    the flag but its use is a dead comment calling an undefined function
    (train_vqgan_lora.py:510-513, 1137-1139); gmdx implements the standard
    (gmdx/ops/tmo.py:tmo_2446a), peak-normalizing by qmax+1.
    """
    from gmdx.ops import fix_mulog_tmo, hard_clip_tmo, linear_scale_tmo, tmo_2446a

    if use_2446a:
        return lambda hdr, qmax: tmo_2446a(hdr / (qmax + 1.0))
    return {
        "fix_mulog": fix_mulog_tmo,
        "hard_clip": hard_clip_tmo,
        "linear_scale": linear_scale_tmo,
    }[name]


def log_validation(args, vae, params, step, val_dir, metrics_log=None):
    """Reference log_validation (:170-327): encode/decode val PNGs to gain
    maps, reconstruct HDR at qmax=49, save .hdr + side-by-side previews;
    grids also land in the tracker (reference :303-322)."""
    import glob

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gmdx.io import load_image, save_hdr_image, save_image, to_model_input
    from gmdx.ops import apply_gm_to_sdr, tmo_cuda

    images = sorted(glob.glob(os.path.join(args.val_images_dir, "*.png")))
    if not images:
        return
    os.makedirs(val_dir, exist_ok=True)
    key = jax.random.key(args.seed or 0)

    # Params enter as a jit ARGUMENT: closing over them would bake ~335 MB
    # of fp32 VAE constants into the lowered module (slow lowering, and the
    # tunneled remote-compile endpoint rejects the oversized request body).
    @jax.jit
    def gm_of(params, x, k):
        post = vae.apply({"params": params}, x, method=vae.encode)
        z = post.sample(k) * 0.18215
        return jax.nn.sigmoid(
            vae.apply({"params": params}, z / 0.18215, method=vae.decode)
        )

    ranges = []
    for i, path in enumerate(images[:4]):
        sdr01 = load_image(path, size=(args.resolution, args.resolution))
        x = jnp.asarray(to_model_input(sdr01))
        gm = np.asarray(gm_of(params, x, jax.random.fold_in(key, i))[0])
        hdr = np.asarray(
            apply_gm_to_sdr(
                jnp.asarray(gm), jnp.asarray(sdr01.transpose(2, 0, 1)), qmax=49.0
            )
        )
        processed = np.asarray(tmo_cuda(jnp.asarray(hdr / 10.0) * 10.0))
        name = f"step{step}_{i}"
        save_hdr_image(
            os.path.join(val_dir, f"hdr_{name}.hdr"), hdr.transpose(1, 2, 0),
            qmax=49.0,
        )
        strip = np.concatenate(
            [sdr01.transpose(2, 0, 1), gm, np.clip(processed, 0, 1)], axis=-1
        )
        save_image(os.path.join(val_dir, f"grid_{name}.png"),
                   strip.transpose(1, 2, 0))
        if metrics_log is not None:
            metrics_log.log_images(
                step, {f"validation/grid_{i}": strip.transpose(1, 2, 0)}
            )
        ranges.append((float(hdr.min()), float(hdr.max())))
    with open(os.path.join(val_dir, "evaluation_log.txt"), "a") as f:
        f.write(f"step {step}: hdr ranges {ranges}\n")


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gmdx.data import ParquetImageDataset, make_dataloader
    from gmdx.dist import initialize as dist_initialize
    from gmdx.dist import make_mesh, replicate, shard_batch

    dist_initialize()  # no-op single-host; joins the pod slice otherwise
    from gmdx.utils import enable_compilation_cache

    enable_compilation_cache()  # default-on persistent compile cache
    from gmdx.io.pipeline import load_pipeline, save_component, save_pipeline
    from gmdx.models import Discriminator, LoRAConfig, VGG19Features
    from gmdx.ops import random_exposure_adjust
    from gmdx.train import (
        Stage1Config,
        init_trainables,
        make_adamw,
        make_disc_step,
        make_ema_step,
        make_gen_step,
        make_manager,
        resolve_resume_step,
        restore_state,
        save_state,
    )
    from gmdx.train.optim import get_lr_schedule
    from gmdx.train.stage1 import Stage1State, effective_vae_params
    from gmdx.train.metrics import MetricsLogger

    bundle = load_pipeline(args.pretrained_model_name_or_path)
    vae = bundle["modules"]["vae"]
    vae_params = bundle["params"]["vae"]
    tokenizer = bundle["tokenizer"]

    # Mixed precision = module compute dtype (params stay fp32; the
    # bf16-compute stage-1 pair measured 903 ms vs the fp32 default —
    # BENCHNOTES.md). fp16 is accepted for CLI parity with the reference.
    compute_dtype = {"bf16": jnp.bfloat16, "fp16": jnp.float16}.get(
        args.mixed_precision, jnp.float32
    )
    if compute_dtype == jnp.float16:
        logging.warning(
            "--mixed_precision fp16: accepted for reference CLI parity, but "
            "bf16 is the TPU-native half type. fp16's 5-bit exponent can "
            "under/overflow GroupNorm statistics and GAN losses; this path "
            "is not benchmarked or numerically validated — prefer bf16."
        )
    if compute_dtype != jnp.float32 or args.gradient_checkpointing:
        vae = type(vae)(
            dataclasses.replace(vae.config, remat=args.gradient_checkpointing),
            dtype=compute_dtype,
        )
        if args.gradient_checkpointing:
            logger.info("gradient checkpointing (remat) enabled on the VAE")
    discriminator = Discriminator(dtype=compute_dtype)
    vgg = VGG19Features(dtype=compute_dtype)
    res = args.resolution
    disc_vars = discriminator.init(
        jax.random.key(1), jnp.zeros((1, 3, res, res))
    )
    if args.perceptual_ckpt:
        from gmdx.io.torch_import import (
            convert_vgg19_state_dict,
            load_torch_checkpoint,
        )

        vgg_params = jax.tree.map(
            jnp.asarray,
            convert_vgg19_state_dict(load_torch_checkpoint(args.perceptual_ckpt)),
        )
        logging.info("loaded pretrained VGG19 from %s", args.perceptual_ckpt)
    else:
        vgg_params = vgg.init(jax.random.key(2), jnp.zeros((1, 3, 224, 224)))[
            "params"
        ]
        logging.warning(
            "--perceptual_ckpt not given: the VGG19 perceptual loss is "
            "RANDOMLY INITIALIZED — a random feature projection, not the "
            "reference's pretrained timm-VGG19 loss "
            "(train_vqgan_lora.py:837-863). Training runs, but Stage-1 "
            "quality will not match the reference. Provide torchvision/timm "
            "vgg19 ImageNet weights via --perceptual_ckpt."
        )

    from gmdx.dist import make_train_mesh

    mesh = make_train_mesh(
        args.shard_strategy,
        args.sp_size if args.shard_strategy == "sp" else args.tp_size,
    )
    n_dev = mesh.shape["data"]
    lr, dlr = args.learning_rate, args.discr_learning_rate
    if args.scale_lr:
        scale = args.gradient_accumulation_steps * args.train_batch_size * n_dev
        lr, dlr = lr * scale, dlr * scale

    cfg = Stage1Config(
        vae_loss=args.vae_loss,
        lora=LoRAConfig(rank=args.lora_rank, alpha=float(args.lora_rank)),
        use_ema=args.use_ema,
    )
    tmo_fn = choose_tmo(args.bright_tmo, use_2446a=args.tmo_2446a)

    dataset = ParquetImageDataset(args.train_metadata)
    n_samples = (
        len(dataset) if args.max_train_samples is None
        else min(args.max_train_samples, len(dataset))
    )
    ga = args.gradient_accumulation_steps
    batches_per_epoch = max(1, n_samples // (args.train_batch_size * n_dev))
    # Optimizer-update steps per epoch, the reference's
    # num_update_steps_per_epoch = ceil(len(dataloader) / grad_accum)
    # (train_vqgan_lora.py:1004) — max_train_steps counts UPDATES.
    steps_per_epoch = max(1, -(-batches_per_epoch // ga))
    max_train_steps = args.max_train_steps or (
        args.num_train_epochs * steps_per_epoch
    )

    gen_opt = make_adamw(
        get_lr_schedule(args.lr_scheduler, lr,
                        num_warmup_steps=args.lr_warmup_steps,
                        num_training_steps=max_train_steps),
        beta1=args.adam_beta1, beta2=args.adam_beta2,
        weight_decay=args.adam_weight_decay, epsilon=args.adam_epsilon,
        max_grad_norm=args.max_grad_norm,
    )
    disc_opt = make_adamw(
        get_lr_schedule(args.discr_lr_scheduler, dlr,
                        num_warmup_steps=args.lr_warmup_steps,
                        num_training_steps=max_train_steps),
        beta1=args.adam_beta1, beta2=args.adam_beta2,
        weight_decay=args.adam_weight_decay, epsilon=args.adam_epsilon,
        max_grad_norm=args.max_grad_norm,
    )
    if ga > 1:
        # Real gradient accumulation (accelerator.accumulate,
        # train_vqgan_lora.py:1150,1199): MultiSteps averages grads over ga
        # micro-batches and applies the inner clip->AdamW->schedule chain
        # once per window — between syncs the step emits zero updates, like
        # accelerate's no-op optimizer.step(). Each optimizer accumulates
        # only within its own phase because the (i // ga) % 2 cadence calls
        # it on exactly ga consecutive batches.
        import optax

        gen_opt = optax.MultiSteps(gen_opt, every_k_schedule=ga)
        disc_opt = optax.MultiSteps(disc_opt, every_k_schedule=ga)

    trainables = init_trainables(jax.random.key(args.seed or 0), vae_params, cfg)
    disc_params = disc_vars["params"]
    other_vars = {k: v for k, v in disc_vars.items() if k != "params"}
    from gmdx.train.ema import ema_init

    state = Stage1State(
        trainables=trainables,
        disc_params=disc_params,
        disc_vars=other_vars,
        opt_state=gen_opt.init(trainables),
        disc_opt_state=disc_opt.init(disc_params),
        ema=ema_init(trainables) if args.use_ema else None,
        step=jnp.zeros((), jnp.int32),
    )
    gen_step = make_gen_step(
        cfg, vae=vae, discriminator=discriminator, vgg=vgg, tmo_fn=tmo_fn,
        optimizer=gen_opt,
    )
    disc_step = make_disc_step(
        cfg, vae=vae, discriminator=discriminator, tmo_fn=tmo_fn,
        optimizer=disc_opt,
    )
    ema_step = make_ema_step(cfg) if args.use_ema else None

    debug_fwd = None
    if args.debug_mode:
        from gmdx.ops import apply_gm_to_sdr
        from gmdx.train.stage1 import gm_forward

        @jax.jit
        def debug_fwd(trainables, vae_frozen, batch, key):
            # The reference's --debug_mode strip inputs
            # (train_vqgan_lora.py:1143-1147): the generator forward with
            # the CURRENT (pre-update) params and the step's posterior key,
            # so the strip shows exactly what this step trained on.
            from gmdx.ops import gamut_compress

            miss = batch["miss_pixel_values"]
            sdr01 = (miss + 1.0) / 2.0
            target01 = (batch["pixel_values"] + 1.0) / 2.0
            params = effective_vae_params(cfg, vae_frozen, trainables)
            gm = gm_forward(cfg, vae, params, miss, key,
                            eps=batch.get("encode_eps"))
            hdr = apply_gm_to_sdr(gm, sdr01, qmax=cfg.qmax)
            tmo = gamut_compress(tmo_fn(hdr, qmax=cfg.qmax))
            return sdr01, gm, hdr, tmo, target01

    manager = make_manager(args.output_dir,
                           max_to_keep=args.checkpoints_total_limit,
                           async_checkpointing=args.async_checkpointing)
    global_step = 0
    resume_step = resolve_resume_step(args.output_dir, args.resume_from_checkpoint)
    if resume_step is not None:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
        )
        state = restore_state(manager, resume_step, abstract)
        global_step = resume_step
        logger.info("resumed from checkpoint step %d", resume_step)

    frozen = {"vae": vae_params, "vgg": vgg_params}
    from gmdx.dist import apply_shard_strategy

    state = apply_shard_strategy(
        mesh, state, args.shard_strategy,
        param_fields=("trainables", "disc_params", "ema"),
        opt_fields=("opt_state", "disc_opt_state"),
    )
    frozen_dev = replicate(mesh, frozen)

    # Resume fast-forward: global_step counts optimizer UPDATES and
    # checkpoints land on sync boundaries, so a checkpoint at step S has
    # consumed exactly S*ga dataloader batches. Skipping them (and starting
    # the batch index there, below) makes the resumed stream — data order,
    # augmentation draws, gen/disc cadence phase, RNG keys — bit-identical
    # to an uninterrupted run. The reference only resumes the epoch loop at
    # first_epoch (train_gm_unet.py:1122-1129 pattern).
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
        # Multi-host: per-host rows (sp keeps the global path).
        process_shard=(args.shard_strategy != "sp"),
        skip_batches=consumed_batches,
    )

    metrics_log = MetricsLogger(
        os.path.join(args.output_dir, args.logging_dir),
        backend=args.report_to, project=args.tracker_project_name,
        config=vars(args),
    )
    logger.info("***** Running training ***** steps=%d", max_train_steps)
    if args.clip_pixel:
        logger.info("Using exposure clip!, prob: 0.7")

    key = jax.random.key(args.seed or 0)
    t_last = time.time()
    # start=consumed_batches: i is the GLOBAL dataloader index, so the
    # (i // ga) % 2 cadence resumes in the right phase and the fold_in key
    # stream continues where the interrupted run left off.
    for i, batch in enumerate(loader, start=consumed_batches):
        if global_step >= max_train_steps:
            break
        k_aug, k_step = jax.random.split(jax.random.fold_in(key, i))
        pixel_values = batch["pixel_values"]
        if args.clip_pixel:
            # Host-side exposure-clip augmentation (reference :1104-1109).
            to_clip = jnp.asarray((pixel_values + 1.0) / 2.0)
            clipped, _ = random_exposure_adjust(k_aug, to_clip, prob=0.7)
            miss = np.asarray(clipped) * 2.0 - 1.0
        else:
            miss = pixel_values
        batch_np = {"pixel_values": pixel_values, "miss_pixel_values": miss}
        if args.shard_strategy == "sp":
            from gmdx.dist import shard_batch_spatial

            dev_batch = shard_batch_spatial(mesh, batch_np)
        else:
            dev_batch = shard_batch(mesh, batch_np, process_local=True)
        if debug_fwd is not None and i % 50 == 0:
            # Reference --debug_mode (train_vqgan_lora.py:1143-1147): a
            # sdr|gm|hdr|tmo|target strip of the first 4 samples, saved on
            # the dataloader index every 50 batches.
            from gmdx.io import save_image

            strips = debug_fwd(
                state.trainables, frozen_dev["vae"], dev_batch, k_step
            )
            strip = np.concatenate(
                [np.asarray(jax.device_get(s)) for s in strips], axis=-1
            )  # NCHW, panels concatenated along W
            strip = np.clip(strip[:4], 0.0, 1.0)  # save_image clamp, like
            # torchvision.utils.save_image's default [0,1] normalization
            grid = np.concatenate(list(strip), axis=-2)  # samples as rows
            debug_dir = os.path.join(args.output_dir, "debug_train")
            os.makedirs(debug_dir, exist_ok=True)
            save_image(
                os.path.join(debug_dir, f"step_{i}_concat_image.png"),
                np.transpose(grid, (1, 2, 0)),
            )
        # Reference alternation cadence on the dataloader index (:1114).
        generator_step = ((i // ga) % 2) == 0
        if generator_step:
            state, m = gen_step(state, frozen_dev, dev_batch, k_step)
            tag = "gen"
        else:
            state, m = disc_step(state, frozen_dev, dev_batch, k_step)
            tag = "discr"
        # Optimizer sync boundary: with accumulation the micro-steps between
        # syncs emit zero updates (MultiSteps) and the reference neither
        # advances global_step, steps EMA, logs, nor checkpoints there
        # (train_vqgan_lora.py:1225-1229).
        if (i + 1) % ga != 0:
            continue
        global_step += 1
        if ema_step is not None:
            state = ema_step(state)

        if global_step % args.log_steps == 0 or global_step == 1:
            dt = time.time() - t_last
            t_last = time.time()
            scalars = {
                f"step_{tag}_loss": float(
                    m.get("gen_loss", m.get("disc_loss", 0.0))
                )
            }
            # Every auxiliary SCALAR the step emits (adaptive_weight,
            # recon/perc/adv split, penalty) — the reference logs the loss
            # split and grad norms too (train_vqgan_lora.py:1235-1244).
            # Non-scalar entries (nested grad-norm dicts) are skipped.
            for k, v in m.items():
                if k in ("gen_loss", "disc_loss"):
                    continue
                try:
                    scalars[k] = float(v)
                except (TypeError, ValueError):
                    pass
            scalars["samples_per_sec"] = (
                args.log_steps * ga * args.train_batch_size * n_dev / dt
                if global_step > 1 else 0.0
            )
            metrics_log.log(global_step, scalars)
            logger.info("step %d [%s] loss %.5f", global_step, tag,
                        scalars[f"step_{tag}_loss"])
        if global_step % args.checkpointing_steps == 0:
            if args.async_checkpointing:
                save_state(manager, global_step, state, wait=False)
            else:
                save_state(manager, global_step, jax.device_get(state))
        if args.val_images_dir and global_step % args.validation_steps == 0:
            host_state = jax.device_get(state)
            eff = effective_vae_params(cfg, vae_params, host_state.trainables)
            log_validation(args, vae, eff, global_step,
                           os.path.join(args.output_dir, "validation"),
                           metrics_log=metrics_log)

    # Final artifacts: finetuned_VAE (merged) + discriminator (:1294-1301).
    manager.wait_until_finished()  # drain any in-flight async checkpoint
    host_state = jax.device_get(state)
    trained = (
        host_state.ema.shadow if host_state.ema is not None
        else host_state.trainables
    )
    eff = effective_vae_params(cfg, vae_params, trained)
    save_pipeline(
        os.path.join(args.output_dir, "finetuned_VAE"),
        components={"vae": (vae, eff)},
        tokenizer=tokenizer,
    )
    save_component(
        os.path.join(args.output_dir, "discriminator"),
        {"depth": discriminator.depth,
         "hidden_channels": discriminator.hidden_channels},
        {"params": host_state.disc_params, **host_state.disc_vars},
        "Discriminator",
    )
    metrics_log.close()
    logger.info("training complete; artifacts in %s", args.output_dir)


if __name__ == "__main__":
    main()
