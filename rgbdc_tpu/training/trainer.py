"""Training orchestration (L5) — reference training/trainer*.py re-expressed.

Trainer base (reference training/trainer.py):
  - experiment naming {dataset}_{modal}{model}_{q} (:65-79)
  - model built from the zoo by name substring (:49-53)
  - dual optimizer + MultiStepLR at 0.75/0.9 of epochs, gamma 0.1 (:81-106)
  - per-epoch: train epoch, validate, scheduler, checkpoint latest/best
  - debug mode: truncated data, small batch, ckpt cleanup (:40-43,125-136)

TrainerSingle  — one-modality loop (trainer_single.py): RD + aux in one
                 jitted step, TB/file logging every log_every steps.
TrainerUnited  — RGB-D joint loop (trainer_united.py): (rgb, depth) batches,
                 united loss with per-modality bpp/distortion logging.
TrainerConcat  — early-fusion baseline (trainer_concat.py): cat(rgb, depth)
                 into a 4-channel single codec.
TrainerMaster  — cascade (trainer_master.py): frozen aux codec for the other
                 modality feeds the master net.

Data-parallel: pass --dist (or dist=True) to shard each batch over the
device mesh; the same jitted step then runs SPMD with XLA-inserted psum
(replacing the reference's NCCL DDP wrapper, utils/parallelWraper.py).
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data import DataLoader, SyntheticRGBD, make_train_dataset
from ..eval.metrics import AverageMeter, compute_metrics
from ..models import build_model
from ..parallel import get_mesh, replicate, shard_batch
from ..utils.logger import setup_logger
from .checkpoint import restore_checkpoint, save_checkpoint
from .losses import (
    lambda_from_quality,
    lambdas_from_fraction_q,
    rate_distortion_loss_single,
    rate_distortion_loss_united,
)
from .optimizers import (
    ReduceLROnPlateau,
    make_dual_optimizer,
    multistep_lr,
    set_plateau_scale,
)
from .state import create_train_state, make_eval_step, make_train_step


class Trainer:
    """Base: model/optimizer/data/logging setup + the fit loop."""

    modal_prefix = ""

    def __init__(self, args, config):
        self.args = args
        self.config = config
        self.debug = getattr(args, "debug", False)
        self.epochs = args.epochs if not self.debug else 2
        self.batch_size = args.batch_size if not self.debug else 2
        self.channel = getattr(args, "channel", 4)
        self.dist = getattr(args, "dist", False)

        exp_root = "experiments_test" if self.debug else "experiments"
        ds_path = getattr(args, "dataset_path", None)
        ds_name = Path(str(ds_path)).name if ds_path else "synthetic"
        self.exp_name = (
            f"{ds_name}_{self.modal_prefix}{args.model}_{args.quality}"
        )
        self.exp_dir = Path(getattr(args, "experiments_dir", exp_root)) / self.exp_name
        self.ckpt_dir = self.exp_dir / "checkpoints"
        self.exp_dir.mkdir(parents=True, exist_ok=True)
        self.logger = setup_logger("train", str(self.exp_dir / "logs"))

        self.model = self.build_model()
        self.train_loader, self.val_loader = self.init_dataset()

        steps_per_epoch = max(len(self.train_loader), 1)
        self.plateau = getattr(args, "lr_scheduler", "multistep") == "plateau"
        if self.plateau:
            self.lr_schedule = args.lr
        else:
            self.lr_schedule = multistep_lr(args.lr, self.epochs, steps_per_epoch)
        self.tx = make_dual_optimizer(
            self.lr_schedule,
            aux_learning_rate=getattr(args, "aux_learning_rate", 1e-3),
            clip_max_norm=getattr(args, "clip_max_norm", 1.0),
            plateau=self.plateau,
        )

        self.mesh = get_mesh() if self.dist else None
        self.log_every = 100
        self._writer = None

    # -- subclass hooks -----------------------------------------------------

    def build_model(self):
        raise NotImplementedError

    def loss_fn(self, output, *batch):
        raise NotImplementedError

    def batch_inputs(self, batch):
        """Map a loader batch to model inputs (tuple)."""
        return batch

    def step_fn_for_epoch(self, epoch: int):
        """Jitted train step for this epoch (cached); subclasses may switch
        objectives mid-training (united depth-loss warmup)."""
        key = self.loss_key_for_epoch(epoch)
        if key not in self._step_cache:
            self._step_cache[key] = make_train_step(
                self.model,
                self.loss_fn_for_key(key),
                donate=True,
                plateau=self.plateau,
            )
        return self._step_cache[key]

    def loss_key_for_epoch(self, epoch: int) -> str:
        return "default"

    def loss_fn_for_key(self, key: str):
        return self.loss_fn

    # -- setup --------------------------------------------------------------

    def init_dataset(self):
        args = self.args
        if getattr(args, "synthetic_data", False) or args.dataset_path is None:
            # 192px: the smallest x64 size the 5-scale MS-SSIM window allows
            train_ds = SyntheticRGBD(n=16, size=192, channel=self.channel)
            val_ds = SyntheticRGBD(n=4, size=192, channel=self.channel, seed=7)
        else:
            name = Path(str(args.dataset_path)).name
            train_ds = make_train_dataset(
                name, args.dataset_path, True, self.channel, self.debug
            )
            val_root = getattr(args, "val_dataset_path", None) or args.dataset_path
            val_ds = make_train_dataset(name, val_root, False, self.channel, self.debug)
        train_loader = DataLoader(
            train_ds, self.batch_size, shuffle=True, seed=getattr(self.args, "seed", 0)
        )
        val_loader = DataLoader(
            val_ds,
            getattr(args, "test_batch_size", 1),
            shuffle=False,
            drop_last=False,
        )
        return train_loader, val_loader

    def tb_writer(self):
        if self._writer is None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(str(self.exp_dir / "tb"))
            except Exception:  # pragma: no cover

                class _Null:
                    def add_scalar(self, *a, **k):
                        pass

                self._writer = _Null()
        return self._writer

    # -- fit loop -----------------------------------------------------------

    def fit(self, seed: int = 0, auto_restore: bool = False,
            ckpt_path: str | None = None, restore_epoch: int = 0):
        from ..utils.profiling import setup_seed

        setup_seed(seed)  # host-side RNGs (reference trainer.py:143-147)
        model = self.model
        example = self._example_batch()
        state = create_train_state(model, jax.random.PRNGKey(seed), example, self.tx)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
        self.logger.info(f"{self.exp_name}: {n_params/1e6:.2f}M params")

        start_epoch = 0
        best_path = self.ckpt_dir / "checkpoint_best_loss.msgpack"
        if auto_restore and best_path.exists():
            state, meta = restore_checkpoint(state, str(best_path))
            start_epoch = meta.get("epoch", 0) + 1
            self.logger.info(f"auto-restored epoch {start_epoch}")
        elif ckpt_path:
            state, meta = restore_checkpoint(
                state, ckpt_path, params_only=restore_epoch > 0
            )
            start_epoch = restore_epoch or meta.get("epoch", 0) + 1
            self.logger.info(f"restored from {ckpt_path} at epoch {start_epoch}")

        if self.mesh is not None:
            state = replicate(self.mesh, state)

        self._step_cache = {}
        eval_fn = make_eval_step(model, self.loss_fn)
        rng = jax.random.PRNGKey(seed + 1)

        best_loss = float("inf")
        # plateau LR decision happens once per epoch on the VALIDATION loss
        # (reference trainer.py:200-201), never on per-step training loss
        plateau_sched = ReduceLROnPlateau() if self.plateau else None
        for epoch in range(start_epoch, self.epochs):
            t0 = time.time()
            step_fn = self.step_fn_for_epoch(epoch)
            state, rng = self.train_one_epoch(state, step_fn, rng, epoch)
            val_loss = self.validate_one_epoch(state, eval_fn, epoch)
            if plateau_sched is not None:
                prev = plateau_sched.scale
                scale = plateau_sched.step(val_loss)
                if scale != prev:
                    state = state.replace(
                        opt_state=set_plateau_scale(state.opt_state, scale)
                    )
                    self.logger.info(f"plateau: lr scale -> {scale:g}")
            is_best = val_loss < best_loss
            best_loss = min(val_loss, best_loss)
            save_checkpoint(
                _unreplicate(state), epoch, val_loss, str(self.ckpt_dir), is_best
            )
            self.logger.info(
                f"epoch {epoch}: val_loss={val_loss:.4f} best={best_loss:.4f} "
                f"({time.time()-t0:.1f}s)"
            )
        if self.debug:
            for p in self.ckpt_dir.glob("checkpoint_*"):
                p.unlink()
        return state

    def _example_batch(self):
        batch = next(iter(self.train_loader))
        return self.batch_inputs(batch)

    def train_one_epoch(self, state, step_fn, rng, epoch):
        writer = self.tb_writer()
        for i, batch in enumerate(self.train_loader):
            inputs = self.batch_inputs(batch)
            if self.mesh is not None:
                inputs = shard_batch(self.mesh, inputs)
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, inputs, step_rng)
            if i % self.log_every == 0:
                scalars = {
                    k: float(v)
                    for k, v in metrics.items()
                    if v is not None and np.ndim(v) == 0
                }
                msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(scalars.items()))
                self.logger.info(f"e{epoch} s{i}: {msg}")
                gs = int(_unreplicate(state).step)
                for k, v in scalars.items():
                    writer.add_scalar(f"train/{k}", v, gs)
        return state, rng

    def validate_one_epoch(self, state, eval_fn, epoch) -> float:
        meter = AverageMeter()
        params = _unreplicate(state).params
        rec_dir = self.exp_dir / "val_rec"
        for bi, batch in enumerate(self.val_loader):
            inputs = self.batch_inputs(batch)
            rd, out = eval_fn(params, inputs)
            meter.update(float(rd["loss"]), n=inputs[0].shape[0])
            # save every 20th reconstruction (reference trainer_single.py:116-118)
            if bi % 20 == 0 and not getattr(self.args, "no_val_rec", False):
                self._save_val_rec(out, rec_dir, epoch, bi)
        self.tb_writer().add_scalar("val/loss", meter.avg, epoch)
        return meter.avg

    def _save_val_rec(self, out, rec_dir, epoch, bi):
        try:
            from PIL import Image

            rec_dir.mkdir(parents=True, exist_ok=True)
            x_hat = out["x_hat"]
            imgs = (
                {"r": x_hat["r"], "d": x_hat["d"]} if isinstance(x_hat, dict)
                else {"x": x_hat}
            )
            for tag, im in imgs.items():
                arr = np.clip(np.asarray(im)[0], 0, 1)
                if arr.shape[-1] == 1:
                    arr = arr[..., 0]
                Image.fromarray((arr * 255).round().astype(np.uint8)).save(
                    rec_dir / f"e{epoch}_b{bi}_{tag}.png"
                )
        except Exception:  # pragma: no cover — reconstruction dumps are best-effort
            pass


def _unreplicate(state):
    return state


class TrainerSingle(Trainer):
    """One-modality codec training (rgb: channel=3, depth: channel=1)."""

    def __init__(self, args, config):
        self.modal_prefix = {1: "depth_", 3: "rgb_", 4: ""}.get(
            getattr(args, "channel", 3), ""
        )
        super().__init__(args, config)
        self.lmbda = lambda_from_quality(args.quality)
        self.metric = getattr(args, "metrics", "mse")

    def build_model(self):
        return build_model(self.args.model, self.config, in_ch=self.channel)

    def loss_fn(self, output, *batch):
        return rate_distortion_loss_single(output, batch[0], self.lmbda, self.metric)


class TrainerUnited(Trainer):
    """Joint RGB-D training with the united loss."""

    def __init__(self, args, config):
        super().__init__(args, config)
        self.rgb_lmbda, self.depth_lmbda = lambdas_from_fraction_q(str(args.quality))
        self.use_depth_composite = (
            getattr(args, "distortionLossForDepth", "d_loss") == "d_loss"
        )
        self.warmup_step = getattr(args, "warmup_step", 0)

    def build_model(self):
        return build_model(self.args.model, self.config)

    def loss_fn(self, output, *batch):
        return self.loss_fn_for_key("composite" if self.use_depth_composite else "mse")(
            output, *batch
        )

    def loss_key_for_epoch(self, epoch: int) -> str:
        """Depth distortion switches from MSE to the composite d_loss after
        warmup_step optimizer steps (reference rd_loss.py:110-118); the
        switch lands on the first epoch past the boundary (one compiled
        step function per phase)."""
        if not self.use_depth_composite:
            return "mse"
        steps_per_epoch = max(len(self.train_loader), 1)
        return "composite" if epoch * steps_per_epoch >= self.warmup_step else "mse"

    def loss_fn_for_key(self, key: str):
        def fn(output, *batch):
            rgb, depth = batch
            return rate_distortion_loss_united(
                output,
                rgb,
                depth,
                self.rgb_lmbda,
                self.depth_lmbda,
                use_depth_composite=(key == "composite"),
            )

        return fn


class TrainerConcat(TrainerSingle):
    """Early-fusion baseline: 4-channel single codec on cat(rgb, depth)."""

    def __init__(self, args, config):
        args.channel = 4
        super().__init__(args, config)
        rq = str(args.quality).split("_")[0]
        self.lmbda = lambda_from_quality(float(rq))

    def batch_inputs(self, batch):
        rgb, depth = batch
        return (np.concatenate([rgb, depth], axis=-1),)
