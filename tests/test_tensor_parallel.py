"""Tensor parallelism over the "model" axis: a TP-sharded UNet forward must
equal the replicated forward exactly (GSPMD inserts the per-head split and
the to_out psum; numerics are unchanged). 8 virtual CPU devices."""

import numpy as np
import jax
import jax.numpy as jnp

from t2v_turbo_tpu.parallel.mesh import make_mesh, replicated
from t2v_turbo_tpu.parallel.tp import shard_params_tp, tp_param_shardings

from tinymodels import tiny_unet


def _setup():
    unet = tiny_unet()
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 4, 8, 8, 4).astype(np.float32)
    )
    ctx = jnp.asarray(
        np.random.RandomState(1).randn(2, 7, 16).astype(np.float32)
    )
    ts = jnp.array([100, 500], jnp.int32)
    params = jax.jit(unet.init)(
        jax.random.PRNGKey(0), x, ts, ctx, timestep_cond=jnp.zeros((2, 8))
    )
    params = jax.tree.map(
        lambda p: p
        + 0.01 * np.random.RandomState(2).randn(*p.shape).astype(p.dtype),
        params,
    )
    return unet, params, x, ts, ctx


class TestTensorParallel:
    def test_specs_target_attention_kernels(self):
        unet, params, *_ = _setup()
        mesh = make_mesh(seq=2, model=2)  # (data=2, seq=2, model=2)
        shardings = tp_param_shardings(mesh, params)
        flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
        split = [
            "/".join(str(getattr(p, "key", p)) for p in path)
            for path, s in flat
            if s.spec != ()
        ]
        assert any("to_q" in p for p in split)
        assert any("to_out" in p for p in split)
        # norms/convs stay replicated
        assert not any("norm" in p for p in split)

    def test_tp_forward_matches_replicated(self):
        unet, params, x, ts, ctx = _setup()
        ref = np.asarray(
            unet.apply(params, x, ts, ctx, timestep_cond=jnp.zeros((2, 8)))
        )

        mesh = make_mesh(seq=2, model=2)
        from jax.sharding import NamedSharding, PartitionSpec as P

        params_tp = shard_params_tp(mesh, params)
        xs = jax.device_put(x, NamedSharding(mesh, P("data", "seq")))
        cs = jax.device_put(ctx, NamedSharding(mesh, P("data")))
        with mesh:
            out = jax.jit(
                lambda p, x_, c: unet.apply(
                    p, x_, ts, c, timestep_cond=jnp.zeros((2, 8))
                )
            )(params_tp, xs, cs)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)

    def test_attention_kernels_actually_split(self):
        unet, params, *_ = _setup()
        mesh = make_mesh(seq=2, model=2)
        params_tp = shard_params_tp(mesh, params)
        flat = jax.tree_util.tree_flatten_with_path(params_tp)[0]
        found = False
        for path, leaf in flat:
            ps = "/".join(str(getattr(p, "key", p)) for p in path)
            if "to_q" in ps and ps.endswith("kernel") and leaf.ndim == 2:
                shard = leaf.addressable_shards[0]
                if shard.data.shape[1] == leaf.shape[1] // 2:
                    found = True
        assert found, "no to_q kernel was actually split over the model axis"
