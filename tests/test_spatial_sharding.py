"""Spatial (row) sharding of the eval forward over a 2-D mesh: XLA inserts
conv halo exchanges; the result must match the unsharded forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbdc_tpu.models import ELIC
from rgbdc_tpu.parallel import get_mesh, replicate
from rgbdc_tpu.parallel.mesh import shard_spatial


class TestSpatialSharding:
    def test_sharded_forward_matches(self, rng):
        mesh = get_mesh(spatial=4)  # 8 devices -> data=2 x spatial=4
        assert mesh.shape == {"data": 2, "spatial": 4}

        model = ELIC(N=8, M=12, slice_ch=(4, 8), in_ch=3)
        x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), dtype=jnp.float32)
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x,
            training=True,
        )
        fwd = jax.jit(lambda v, x: model.apply(v, x, training=False))
        ref = fwd(v, x)

        v_r = replicate(mesh, v)
        x_s = shard_spatial(mesh, x)
        out = fwd(v_r, x_s)
        np.testing.assert_allclose(
            np.asarray(out["x_hat"]), np.asarray(ref["x_hat"]), rtol=1e-4, atol=1e-4
        )
