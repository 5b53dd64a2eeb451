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
        # the GEGLU FF proj (C, 2, F) must split F (Megatron MLP column
        # parallel) and the ff out kernel must split its input dim (row
        # parallel) — the widest matmuls in the block
        ff_proj = ff_out = False
        for path, leaf in flat:
            ps = "/".join(str(getattr(p, "key", p)) for p in path)
            if "/ff/proj/" in ps and ps.endswith("kernel"):
                shard = leaf.addressable_shards[0]
                ff_proj |= shard.data.shape[2] == leaf.shape[2] // 2
            if "/ff/out/" in ps and ps.endswith("kernel"):
                shard = leaf.addressable_shards[0]
                ff_out |= shard.data.shape[0] == leaf.shape[0] // 2
        assert ff_proj, "no GEGLU proj kernel split over the model axis"
        assert ff_out, "no GEGLU out kernel split over the model axis"


class TestConvChannelTP:
    """conv_channels=True: Megatron-style column/row pairing over the
    ResBlock and TemporalConvBlock conv chains (tp.py docstring). The GN
    between paired convs keeps local stats because the model-axis size
    divides the 32 groups."""

    def test_conv_kernels_split(self):
        unet, params, *_ = _setup()
        mesh = make_mesh(seq=2, model=2)
        shardings = tp_param_shardings(mesh, params, conv_channels=True)
        flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
        by_path = {
            "/".join(str(getattr(p, "key", p)) for p in path): s.spec
            for path, s in flat
        }
        col = [p for p, s in by_path.items()
               if s == (None, None, None, "model")]
        row = [p for p, s in by_path.items()
               if s == (None, None, "model", None)]
        assert any("in_conv" in p for p in col)
        assert any("conv1" in p or "conv3" in p for p in col)
        assert any("out_conv" in p for p in row)
        assert any("conv2" in p or "conv4" in p for p in row)
        # the TOP-LEVEL conv_in / out_conv (replicated inputs) must not split
        assert by_path["params/conv_in/kernel"] == ()
        assert by_path["params/out_conv/kernel"] == ()
        # emb_proj out-splits to meet in_conv's sharded output
        assert any(
            "emb_proj" in p and s == (None, "model")
            for p, s in by_path.items()
        )

    def test_conv_tp_forward_matches_replicated(self):
        unet, params, x, ts, ctx = _setup()
        ref = np.asarray(
            unet.apply(params, x, ts, ctx, timestep_cond=jnp.zeros((2, 8)))
        )
        mesh = make_mesh(seq=2, model=2)
        from jax.sharding import NamedSharding, PartitionSpec as P

        params_tp = shard_params_tp(mesh, params, conv_channels=True)
        xs = jax.device_put(x, NamedSharding(mesh, P("data", "seq")))
        cs = jax.device_put(ctx, NamedSharding(mesh, P("data")))
        with mesh:
            out = jax.jit(
                lambda p, x_, c: unet.apply(
                    p, x_, ts, c, timestep_cond=jnp.zeros((2, 8))
                )
            )(params_tp, xs, cs)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)

    def test_conv_split_is_opt_in(self):
        """Default (conv_channels=False) keeps every conv replicated — the
        pre-existing attention-only behavior."""
        unet, params, *_ = _setup()
        mesh = make_mesh(seq=2, model=2)
        sh = tp_param_shardings(mesh, params)
        conv_specs = (
            (None, None, None, "model"),
            (None, None, "model", None),
        )
        assert not any(
            s in conv_specs
            for s in jax.tree.leaves(jax.tree.map(lambda x: x.spec, sh))
        )


class TestHeadBoundaryGuard:
    def test_non_divisible_head_count_stays_replicated(self):
        """VC2 level 0 has 5 heads of 64 (kernel dim 320): 320 % 2 == 0 but
        5 heads can't split 2-way — with head_dim given, such kernels must
        stay replicated instead of splitting mid-head."""
        unet, params, *_ = _setup()
        mesh = make_mesh(seq=2, model=2)
        # tiny UNet: head_dim 16, channels 32/64 -> 2 and 4 heads (divisible)
        divisible = tp_param_shardings(mesh, params, head_dim=16)
        n_split_div = sum(
            1 for s in jax.tree.leaves(
                jax.tree.map(lambda x: x.spec != (), divisible)
            ) if s
        )
        assert n_split_div > 0
        # pretend heads are 3x wider: 32/48 -> not integral or odd -> all
        # ATTENTION kernels must fall back to replication; the GEGLU FF
        # kernels have no head structure and legitimately stay split
        odd = tp_param_shardings(mesh, params, head_dim=48)
        flat = jax.tree_util.tree_flatten_with_path(odd)[0]
        for path, sh in flat:
            ps = "/".join(str(getattr(p, "key", p)) for p in path)
            if sh.spec == ():
                continue
            assert "/ff/" in ps, f"attention kernel still split: {ps}"


class TestNoModelAxis:
    def test_mesh_without_model_axis_replicates(self):
        """A mesh built without a "model" axis must yield replicated specs
        — specs naming the absent axis would crash NamedSharding
        construction for every attention kernel."""
        from jax.sharding import Mesh, PartitionSpec as P

        _, params, *_ = _setup()
        devs = np.array(jax.devices()[:8]).reshape(4, 2)
        mesh = Mesh(devs, ("data", "seq"))
        sh = tp_param_shardings(mesh, params, conv_channels=True)
        assert all(s.spec == P() for s in jax.tree.leaves(sh))
