"""Master-cascade trainer (reference training/trainer_master.py:24-48):
a frozen aux-modality ELIC (return_mid=True, weights from -c1) runs in eval
mode on the other modality; its decoded image + decoder taps condition the
master net.  Only master parameters train; the dataset is forced to
channel-4 pairs."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import ELIC, build_model
from .losses import rate_distortion_loss_single
from .trainer import TrainerSingle


class TrainerMaster(TrainerSingle):
    def __init__(self, args, config):
        self.master_channel = args.channel if args.channel in (1, 3) else 3
        args.channel = 4  # paired dataset (reference forces channel-4 data)
        super().__init__(args, config)
        self.channel = 4

    def build_model(self):
        cfg = self.config
        self.aux_model = ELIC(
            N=cfg.N,
            M=cfg.M,
            slice_ch=tuple(cfg.slice_ch),
            quant=cfg.quant,
            in_ch=1 if self.master_channel == 3 else 3,
            return_mid=True,
        )
        self.aux_variables = None  # initialized lazily / restored from -c1
        self._aux_fwd = jax.jit(
            lambda v, x: self.aux_model.apply(v, x, training=False)
        )
        return build_model("ELIC_master", cfg, in_ch=self.master_channel)

    def _ensure_aux(self, aux_example):
        if self.aux_variables is not None:
            return
        self.aux_variables = self.aux_model.init(
            {"params": jax.random.PRNGKey(42), "noise": jax.random.PRNGKey(43)},
            aux_example,
            training=True,
        )
        ckpt = getattr(self.args, "checkpoint_aux", None)
        if ckpt:
            from .checkpoint import load_params

            self.aux_variables = {
                "params": load_params(ckpt, self.aux_variables["params"])
            }
            self.logger.info(f"aux codec restored from {ckpt}")

    def batch_inputs(self, batch):
        rgb, depth = batch
        if self.master_channel == 3:
            x, aux = rgb, depth
        else:
            x, aux = depth, rgb
        aux = jnp.asarray(aux)
        self._ensure_aux(aux)
        aux_out = self._aux_fwd(self.aux_variables, aux)
        return (
            jnp.asarray(x),
            jax.lax.stop_gradient(aux_out["x_hat"]),
            jax.lax.stop_gradient(aux_out["up1"]),
            jax.lax.stop_gradient(aux_out["up2"]),
            jax.lax.stop_gradient(aux_out["up3"]),
        )

    def loss_fn(self, output, *batch):
        return rate_distortion_loss_single(output, batch[0], self.lmbda, self.metric)
