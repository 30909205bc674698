"""Post-training model finalization CLI (reference
CompressAI/compressai/utils/update_model/__main__.py): load a training
checkpoint, rebuild the quantized CDF tables from the trained entropy
bottlenecks, and re-save with a content-hash suffix for release.

Usage: python -m rgbdc_tpu.cli.update_model -c ckpt.msgpack -m ELIC [--tiny]
"""

from __future__ import annotations

import argparse
import hashlib
import pickle
import sys
from pathlib import Path

import jax
import jax.numpy as jnp


def options(argv=None):
    p = argparse.ArgumentParser(description="finalize a checkpoint for release")
    p.add_argument("-c", "--checkpoint", required=True)
    p.add_argument("-m", "--model", default="ELIC")
    p.add_argument("--channel", type=int, default=3)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("-o", "--out-dir", default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = options(argv)
    from flax import serialization

    from ..models import CodecTables, build_model
    from ..utils.config import mlic_model_config, model_config, tiny_model_config

    if args.tiny:
        config = tiny_model_config()
    elif "MLIC" in args.model:
        config = mlic_model_config()
    else:
        config = model_config()

    in_ch = 3 if args.channel == 3 else 1
    model = build_model(args.model, config, in_ch=in_ch)
    if "united" in args.model:
        inputs = (jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 128, 128, 1)))
        eb_names = ("rgb_entropy_bottleneck", "depth_entropy_bottleneck")
    else:
        inputs = (jnp.zeros((1, 128, 128, in_ch)),)
        eb_names = ("entropy_bottleneck",)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        *inputs,
        training=True,
    )
    from ..training.checkpoint import load_params

    variables = {"params": load_params(args.checkpoint, variables["params"])}

    tables = CodecTables.build(variables, eb_names=eb_names)  # the "update()"

    params_bytes = serialization.to_bytes(variables)
    digest = hashlib.sha256(params_bytes).hexdigest()[:8]
    out_dir = Path(args.out_dir or Path(args.checkpoint).parent)
    out_path = out_dir / f"{Path(args.checkpoint).stem}-{digest}.msgpack"
    out_path.write_bytes(params_bytes)
    tables_path = out_dir / f"{Path(args.checkpoint).stem}-{digest}.tables.pkl"
    with open(tables_path, "wb") as f:
        pickle.dump(tables, f)
    print(f"wrote {out_path}\nwrote {tables_path}")
    return str(out_path)


if __name__ == "__main__":
    main(sys.argv[1:])
