"""Golden-value tests for schedule math, LCM scalings, scheduler, and solver.

Expected values are computed with independent numpy closed forms (and checked
against the published scheduler semantics: scaled-linear betas, LCM timestep
subsampling, boundary-condition scalings, DDIM step/inversion round trips).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t2v_turbo_tpu.diffusion import (
    DDIMSolver,
    DiffusionSchedule,
    LCMScheduler,
    add_noise,
    get_velocity,
    guidance_scale_embedding,
    huber_loss,
    lcm_timesteps,
    make_betas,
    make_vc2_scale_arr,
    predicted_noise,
    predicted_origin,
    q_sample,
    rescale_zero_terminal_snr,
    scalings_for_boundary_conditions,
    timestep_embedding,
)


def ref_betas_scaled_linear(start, end, n):
    return np.linspace(start**0.5, end**0.5, n) ** 2


class TestSchedule:
    def test_scaled_linear_betas(self):
        b = make_betas("scaled_linear", 1000, 0.00085, 0.012)
        expected = ref_betas_scaled_linear(0.00085, 0.012, 1000)
        np.testing.assert_allclose(b, expected, rtol=1e-12)
        assert b[0] == pytest.approx(0.00085)
        assert b[-1] == pytest.approx(0.012)

    def test_linear_betas(self):
        b = make_betas("linear", 100, 1e-4, 2e-2)
        np.testing.assert_allclose(b, np.linspace(1e-4, 2e-2, 100), rtol=1e-12)

    def test_cosine_betas_bounded(self):
        b = make_betas("squaredcos_cap_v2", 1000)
        assert (b > 0).all() and (b <= 0.999).all()

    def test_alphas_cumprod_monotone(self):
        s = DiffusionSchedule.create()
        ac = np.asarray(s.alphas_cumprod)
        assert (np.diff(ac) < 0).all()
        assert 0 < ac[-1] < ac[0] < 1

    def test_zero_terminal_snr(self):
        b = make_betas("scaled_linear", 1000, 0.00085, 0.012)
        b2 = rescale_zero_terminal_snr(b)
        ac = np.cumprod(1 - b2)
        assert abs(np.sqrt(ac[-1])) < 1e-6  # terminal SNR ~ 0
        # first alpha_bar preserved
        np.testing.assert_allclose(ac[0], np.cumprod(1 - b)[0], rtol=1e-9)

    def test_vc2_scale_arr(self):
        arr = make_vc2_scale_arr(1000, scale_a=1.0, scale_b=0.7, mid_step=400)
        assert arr.shape == (1000,)
        assert arr[0] == pytest.approx(1.0)
        assert arr[399] == pytest.approx(0.7)
        assert (arr[400:] == 0.7).all()

    def test_q_sample_closed_form(self):
        s = DiffusionSchedule.create(use_scale=True, scale_b=0.7)
        x0 = jnp.ones((2, 3, 4))
        noise = jnp.full((2, 3, 4), 0.5)
        t = jnp.array([10, 500])
        out = q_sample(s, x0, t, noise, use_scale=True)
        ac = np.asarray(s.alphas_cumprod)
        sc = np.asarray(s.scale_arr)
        for i, ti in enumerate([10, 500]):
            exp = np.sqrt(ac[ti]) * sc[ti] * 1.0 + np.sqrt(1 - ac[ti]) * 0.5
            np.testing.assert_allclose(out[i], exp, rtol=1e-5)

    def test_add_noise_and_velocity_identity(self):
        # x_t = a x0 + s eps ; v = a eps - s x0 ; then x0 = a x_t - s v
        s = DiffusionSchedule.create()
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (2, 8))
        eps = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
        t = jnp.array([100, 900])
        xt = add_noise(s, x0, eps, t)
        v = get_velocity(s, x0, eps, t)
        ac = np.asarray(s.alphas_cumprod)[np.array([100, 900])][:, None]
        rec = np.sqrt(ac) * np.asarray(xt) - np.sqrt(1 - ac) * np.asarray(v)
        np.testing.assert_allclose(rec, np.asarray(x0), atol=1e-5)


class TestLCMMath:
    def test_boundary_scalings(self):
        # closed form with sigma_data=0.5, scaling 10
        t = jnp.array([0.0, 250.0, 999.0])
        c_skip, c_out = scalings_for_boundary_conditions(t)
        st = 10 * np.array([0.0, 250.0, 999.0])
        np.testing.assert_allclose(c_skip, 0.25 / (st**2 + 0.25), rtol=1e-6)
        np.testing.assert_allclose(c_out, st / np.sqrt(st**2 + 0.25), rtol=1e-6)
        # boundary condition: at t=0 the model is the identity on x
        assert c_skip[0] == pytest.approx(1.0)
        assert c_out[0] == pytest.approx(0.0)

    def test_w_embedding_shape_and_values(self):
        w = jnp.array([7.5, 0.0])
        emb = guidance_scale_embedding(w, 256)
        assert emb.shape == (2, 256)
        # w=0 -> sin(0)=0 first half, cos(0)=1 second half
        np.testing.assert_allclose(emb[1, :128], 0.0, atol=1e-7)
        np.testing.assert_allclose(emb[1, 128:], 1.0, atol=1e-7)
        # first frequency term of w=7.5: sin(7500)
        assert emb[0, 0] == pytest.approx(np.sin(7500.0), abs=1e-3)

    def test_timestep_embedding_cos_sin_order(self):
        t = jnp.array([0.0])
        emb = timestep_embedding(t, 320)
        np.testing.assert_allclose(emb[0, :160], 1.0, atol=1e-7)  # cos(0)
        np.testing.assert_allclose(emb[0, 160:], 0.0, atol=1e-7)  # sin(0)

    def test_pred_origin_noise_roundtrip(self):
        s = DiffusionSchedule.create()
        key = jax.random.PRNGKey(2)
        x0 = jax.random.normal(key, (2, 16))
        eps = jax.random.normal(jax.random.PRNGKey(3), (2, 16))
        t = jnp.array([321, 654])
        xt = add_noise(s, x0, eps, t)
        # epsilon parameterization inverts exactly
        np.testing.assert_allclose(
            predicted_origin(eps, t, xt, "epsilon", s), x0, atol=1e-4
        )
        np.testing.assert_allclose(
            predicted_noise(x0, t, xt, "sample", s), eps, atol=1e-4
        )
        v = get_velocity(s, x0, eps, t)
        np.testing.assert_allclose(
            predicted_origin(v, t, xt, "v_prediction", s), x0, atol=1e-4
        )
        np.testing.assert_allclose(
            predicted_noise(v, t, xt, "v_prediction", s), eps, atol=1e-4
        )

    def test_huber_loss(self):
        a = jnp.zeros((4,))
        b = jnp.zeros((4,))
        assert huber_loss(a, b) == pytest.approx(0.0)
        b2 = jnp.full((4,), 3.0)
        # for large residual, pseudo-huber ~ |r| - c
        assert huber_loss(a, b2) == pytest.approx(3.0 - 0.001, abs=1e-5)


class TestLCMScheduler:
    def test_timestep_subsampling(self):
        ts = lcm_timesteps(4, lcm_origin_steps=50, num_train_timesteps=1000)
        # c=20 -> origin grid {19, 39, ..., 999}; skip=12 -> take every 12th from end
        expected = np.array([999, 759, 519, 279])
        np.testing.assert_array_equal(ts, expected)
        ts16 = lcm_timesteps(16, lcm_origin_steps=200, num_train_timesteps=1000)
        assert len(ts16) == 16 and ts16[0] == 999
        assert (np.diff(ts16) < 0).all()

    def test_step_denoised_matches_closed_form(self):
        sched = DiffusionSchedule.create()
        lcm = LCMScheduler(schedule=sched)
        key = jax.random.PRNGKey(0)
        sample = jax.random.normal(key, (1, 4, 2, 4, 4))
        eps = jax.random.normal(jax.random.PRNGKey(1), sample.shape)
        t = jnp.array(999)
        prev_t = jnp.array(759)
        noise = jax.random.normal(jax.random.PRNGKey(2), sample.shape)
        prev, denoised = lcm.step(eps, t, prev_t, sample, noise)
        ac = np.asarray(sched.alphas_cumprod)
        pred_x0 = (np.asarray(sample) - np.sqrt(1 - ac[999]) * np.asarray(eps)) / np.sqrt(
            ac[999]
        )
        st = 10.0 * 999
        c_skip = 0.25 / (st**2 + 0.25)
        c_out = st / np.sqrt(st**2 + 0.25)
        exp_den = c_out * pred_x0 + c_skip * np.asarray(sample)
        np.testing.assert_allclose(denoised, exp_den, rtol=2e-4, atol=1e-5)
        exp_prev = np.sqrt(ac[759]) * exp_den + np.sqrt(1 - ac[759]) * np.asarray(noise)
        np.testing.assert_allclose(prev, exp_prev, rtol=2e-4, atol=1e-5)

    def test_step_single_step_no_noise(self):
        sched = DiffusionSchedule.create()
        lcm = LCMScheduler(schedule=sched)
        sample = jnp.ones((1, 4))
        eps = jnp.zeros((1, 4))
        prev, denoised = lcm.step(eps, jnp.array(999), jnp.array(999), sample, None)
        np.testing.assert_allclose(prev, denoised)

    def test_scan_sampling_loop_compiles(self):
        """The whole multistep loop as a single jitted lax.scan."""
        sched = DiffusionSchedule.create()
        lcm = LCMScheduler(schedule=sched)
        ts = jnp.asarray(lcm.timesteps(4), dtype=jnp.int32)
        prev_ts = jnp.concatenate([ts[1:], ts[-1:]])

        def fake_model(x, t):
            return 0.1 * x  # stand-in eps prediction

        @jax.jit
        def sample_loop(x0, key):
            def body(carry, inp):
                x, key = carry
                t, pt = inp
                key, sub = jax.random.split(key)
                eps = fake_model(x, t)
                noise = jax.random.normal(sub, x.shape)
                x_next, denoised = lcm.step(eps, t, pt, x, noise)
                return (x_next, key), denoised

            (_, _), denoised_seq = jax.lax.scan(body, (x0, key), (ts, prev_ts))
            return denoised_seq[-1]

        out = sample_loop(jnp.ones((1, 4, 2, 4, 4)), jax.random.PRNGKey(0))
        assert out.shape == (1, 4, 2, 4, 4)
        assert np.isfinite(np.asarray(out)).all()


class TestDDIMSolver:
    def _solver(self, use_scale=False, **kw):
        sched = DiffusionSchedule.create()
        return DDIMSolver.create(
            np.asarray(sched.alphas_cumprod), use_scale=use_scale, **kw
        ), sched

    def test_grid(self):
        solver, _ = self._solver(ddim_timesteps=50)
        ts = np.asarray(solver.ddim_timesteps)
        np.testing.assert_array_equal(ts, np.arange(1, 51) * 20 - 1)
        assert solver.step_ratio == 20
        # prev alphas = shifted grid with alphas_cumprod[0] at front
        ac = np.asarray(solver.alpha_cumprods)
        np.testing.assert_allclose(
            np.asarray(solver.ddim_alpha_cumprods_prev)[1:],
            ac[ts[:-1]],
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(solver.ddim_alpha_cumprods_prev)[0], ac[0], rtol=1e-6
        )

    def test_ddim_step_exact_on_perfect_prediction(self):
        """With exact (x0, eps) of a known mixture, ddim_step lands exactly on
        the DDIM trajectory point at the previous grid timestep."""
        solver, sched = self._solver()
        x0 = jnp.full((1, 8), 2.0)
        eps = jnp.full((1, 8), -1.0)
        idx = jnp.array([30])
        prev_t = np.asarray(solver.ddim_timesteps)[29]
        x_prev = solver.ddim_step(x0, eps, idx)
        ac_prev = np.asarray(sched.alphas_cumprod)[prev_t]
        expected = np.sqrt(ac_prev) * 2.0 + np.sqrt(1 - ac_prev) * (-1.0)
        np.testing.assert_allclose(x_prev, expected, rtol=1e-5)

    def test_scale_variant(self):
        solver, sched = self._solver(use_scale=True, scale_b=0.7, mid_step=400)
        x0 = jnp.ones((1, 4))
        eps = jnp.zeros((1, 4))
        idx = jnp.array([10])  # timestep 219 < mid_step: ramp region
        x_prev = solver.ddim_step(x0, eps, idx)
        ts = np.asarray(solver.ddim_timesteps)
        scale_arr = make_vc2_scale_arr(1000, 1.0, 0.7, 400)
        coef = scale_arr[ts[9]] / scale_arr[ts[10]]
        ac_prev = np.asarray(sched.alphas_cumprod)[ts[9]]
        np.testing.assert_allclose(x_prev, np.sqrt(ac_prev) * coef, rtol=1e-5)

    def test_inversion_roundtrip(self):
        """ddim_reverse_step then the corresponding forward reconstruction is
        (near) identity when the same eps is used — the inverse_ddim.py
        correctness probe, as a unit test."""
        solver, sched = self._solver()
        ac = np.asarray(sched.alphas_cumprod)
        x_prev = jnp.asarray(np.random.RandomState(0).randn(1, 16).astype(np.float32))
        eps = jnp.asarray(np.random.RandomState(1).randn(1, 16).astype(np.float32))
        ts = jnp.array([599])
        x_t = solver.ddim_reverse_step(x_prev, eps, ts)
        # forward DDIM step: from t=599 back to t=579 with same eps
        a_t, a_p = ac[599], ac[579]
        pred_x0 = (np.asarray(x_t) - np.sqrt(1 - a_t) * np.asarray(eps)) / np.sqrt(a_t)
        rec = np.sqrt(a_p) * pred_x0 + np.sqrt(1 - a_p) * np.asarray(eps)
        np.testing.assert_allclose(rec, np.asarray(x_prev), atol=1e-4)

    def test_index_to_timestep(self):
        solver, _ = self._solver()
        np.testing.assert_array_equal(
            np.asarray(solver.index_to_timestep(jnp.array([0, 49]))), [19, 999]
        )


class TestAncestralSampling:
    """Ancestral DDPM path (reference ddpm3d.py:267-283, 680-833)."""

    def _sched(self):
        from t2v_turbo_tpu.diffusion import DiffusionSchedule

        return DiffusionSchedule.create(num_timesteps=50)

    def test_posterior_tables_closed_form(self):
        from t2v_turbo_tpu.diffusion import posterior_tables

        sched = self._sched()
        tabs = posterior_tables(sched)
        betas = np.asarray(sched.betas, np.float64)
        abar = np.cumprod(1.0 - betas)
        abar_prev = np.append(1.0, abar[:-1])
        var = betas * (1.0 - abar_prev) / (1.0 - abar)
        np.testing.assert_allclose(
            np.asarray(tabs.variance), var, rtol=5e-5, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(tabs.mean_coef1),
            betas * np.sqrt(abar_prev) / (1.0 - abar), rtol=5e-5,
        )
        np.testing.assert_allclose(
            np.asarray(tabs.mean_coef2),
            (1.0 - abar_prev) * np.sqrt(1.0 - betas) / (1.0 - abar),
            rtol=5e-5,
        )
        np.testing.assert_allclose(
            np.asarray(tabs.log_variance_clipped),
            np.log(np.maximum(var, 1e-20)), rtol=1e-4,
        )
        # v_posterior interpolation (ddpm3d.py:175-178)
        tabs_v = posterior_tables(sched, v_posterior=1.0)
        np.testing.assert_allclose(
            np.asarray(tabs_v.variance), betas, rtol=1e-5
        )

    def test_predict_start_inverts_q_sample(self):
        """q_sample then predict_start_from_noise with the true noise must
        recover x0 exactly."""
        from t2v_turbo_tpu.diffusion import (
            posterior_tables, predict_start_from_noise, q_sample,
        )

        sched = self._sched()
        tabs = posterior_tables(sched)
        rng = np.random.RandomState(0)
        x0 = jnp.asarray(rng.randn(2, 8).astype(np.float32))
        noise = jnp.asarray(rng.randn(2, 8).astype(np.float32))
        t = jnp.array([3, 40])
        x_t = q_sample(sched, x0, t, noise)
        rec = predict_start_from_noise(tabs, x_t, t, noise)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=2e-4)

    def test_scan_loop_matches_python_loop(self):
        """The lax.scan chain must produce exactly what a per-step Python
        loop (the reference's iteration structure) produces with the same
        key threading and a deterministic model."""
        from t2v_turbo_tpu.diffusion import (
            p_sample, p_sample_loop, posterior_tables,
        )

        sched = self._sched()
        tabs = posterior_tables(sched)
        model_fn = lambda x, tb: 0.1 * x  # deterministic stand-in eps model
        x_T = jnp.asarray(
            np.random.RandomState(1).randn(2, 6).astype(np.float32)
        )
        key = jax.random.PRNGKey(7)
        out = p_sample_loop(model_fn, sched, x_T, key)

        x, k = x_T, key
        for i in range(sched.num_timesteps - 1, -1, -1):
            k, sub = jax.random.split(k)
            tb = jnp.full((2,), i, jnp.int32)
            x, _ = p_sample(tabs, sub, model_fn(x, tb), x, tb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)
        assert np.isfinite(np.asarray(out)).all()

    def test_no_noise_at_t0(self):
        """p_sample at t=0 must be the deterministic posterior mean
        (ddpm3d.py:754 nonzero_mask)."""
        from t2v_turbo_tpu.diffusion import (
            p_mean_variance, p_sample, posterior_tables,
        )

        sched = self._sched()
        tabs = posterior_tables(sched)
        x = jnp.asarray(np.random.RandomState(2).randn(1, 4).astype(np.float32))
        eps = jnp.zeros_like(x)
        t = jnp.array([0])
        out1, _ = p_sample(tabs, jax.random.PRNGKey(0), eps, x, t)
        out2, _ = p_sample(tabs, jax.random.PRNGKey(1), eps, x, t)
        mean, *_ = p_mean_variance(tabs, eps, x, t)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
        np.testing.assert_allclose(np.asarray(out1), np.asarray(mean))

    def test_clip_denoised(self):
        from t2v_turbo_tpu.diffusion import p_mean_variance, posterior_tables

        sched = self._sched()
        tabs = posterior_tables(sched)
        x = jnp.full((1, 4), 100.0)
        *_, x_recon = p_mean_variance(
            tabs, jnp.zeros_like(x), x, jnp.array([10]), clip_denoised=True
        )
        assert float(jnp.abs(x_recon).max()) <= 1.0


class TestDDIMSampleLoop:
    """Standalone DDIM sampler chain (reference lvdm DDIMSampler surface)."""

    def _solver(self, eta=0.0):
        from t2v_turbo_tpu.diffusion import DiffusionSchedule
        from t2v_turbo_tpu.diffusion.ddim import DDIMSolver

        sched = DiffusionSchedule.create()
        return DDIMSolver.create(
            np.asarray(sched.alphas_cumprod), ddim_timesteps=10, ddim_eta=eta
        ), sched

    def test_zero_eps_telescopes(self):
        """With eps == 0 and eta == 0 every step multiplies by
        sqrt(a_prev/a_t); the chain telescopes to sqrt(a_prev[0]/a_t[-1])."""
        from t2v_turbo_tpu.diffusion.ddim import ddim_sample_loop

        solver, _ = self._solver()
        x = jnp.asarray(np.random.RandomState(0).randn(1, 8).astype(np.float32))
        out = ddim_sample_loop(
            lambda z, t: jnp.zeros_like(z), solver, x, grid="solver"
        )
        ac = np.asarray(solver.ddim_alpha_cumprods)
        ac_prev = np.asarray(solver.ddim_alpha_cumprods_prev)
        factor = np.sqrt(ac_prev[0] / ac[-1])
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(x) * factor, rtol=2e-4
        )

    def test_cfg_mixing(self):
        """cfg_scale=1 ignores the uncond branch; cfg_scale=2 uses
        e_u + 2(e_c - e_u)."""
        from t2v_turbo_tpu.diffusion.ddim import ddim_sample_loop

        solver, _ = self._solver()
        x = jnp.asarray(np.random.RandomState(1).randn(1, 8).astype(np.float32))
        cond = lambda z, t: 0.1 * jnp.ones_like(z)
        uncond = lambda z, t: 0.3 * jnp.ones_like(z)
        base = ddim_sample_loop(cond, solver, x)
        same = ddim_sample_loop(cond, solver, x, cfg_scale=1.0,
                                uncond_model_fn=uncond)
        np.testing.assert_allclose(np.asarray(base), np.asarray(same))
        # e_u + 2(e_c - e_u) = 2 e_c - e_u = -0.1: equals a plain model at -0.1
        mixed = ddim_sample_loop(cond, solver, x, cfg_scale=2.0,
                                 uncond_model_fn=uncond)
        expect = ddim_sample_loop(
            lambda z, t: -0.1 * jnp.ones_like(z), solver, x
        )
        np.testing.assert_allclose(
            np.asarray(mixed), np.asarray(expect), rtol=1e-4, atol=1e-5
        )
        with pytest.raises(ValueError, match="uncond"):
            ddim_sample_loop(cond, solver, x, cfg_scale=2.0)

    def test_eta_noise_deterministic_per_key(self):
        from t2v_turbo_tpu.diffusion.ddim import ddim_sample_loop

        solver, _ = self._solver(eta=0.5)
        assert float(np.asarray(solver.ddim_sigmas).max()) > 0
        x = jnp.asarray(np.random.RandomState(2).randn(1, 8).astype(np.float32))
        model = lambda z, t: 0.05 * z
        # sampler grid: eta is the loop argument
        a = ddim_sample_loop(model, solver, x, key=jax.random.PRNGKey(3),
                             eta=0.5)
        b = ddim_sample_loop(model, solver, x, key=jax.random.PRNGKey(3),
                             eta=0.5)
        c = ddim_sample_loop(model, solver, x, key=jax.random.PRNGKey(4),
                             eta=0.5)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        assert float(jnp.abs(a - c).max()) > 1e-6
        assert np.isfinite(np.asarray(a)).all()
        # solver grid: eta comes from the solver's precomputed sigmas
        s = ddim_sample_loop(model, solver, x, key=jax.random.PRNGKey(3),
                             grid="solver")
        assert float(jnp.abs(a - s).max()) > 1e-6  # different grid+sigmas
        # no key + eta>0 still emits (fixed-seed) noise rather than
        # silently under-dispersing
        nk = ddim_sample_loop(model, solver, x, eta=0.5)
        det = ddim_sample_loop(model, solver, x, eta=0.0)
        assert float(jnp.abs(nk - det).max()) > 1e-6

    def test_scale_correction_on_solver_grid(self):
        """use_scale applies pred_x0/scale_t and sqrt(a_prev)*scale_prev
        (reference ddim.py:412-427); with eps=0 each step multiplies by
        sqrt(a_prev/a_t) * scale_prev/scale_t and the chain telescopes."""
        from t2v_turbo_tpu.diffusion import DiffusionSchedule
        from t2v_turbo_tpu.diffusion.ddim import DDIMSolver, ddim_sample_loop

        sched = DiffusionSchedule.create(use_scale=True)
        solver = DDIMSolver.create(
            np.asarray(sched.alphas_cumprod), ddim_timesteps=10,
            use_scale=True,
        )
        x = jnp.asarray(np.random.RandomState(4).randn(1, 6).astype(np.float32))
        out = ddim_sample_loop(
            lambda z, t: jnp.zeros_like(z), solver, x, grid="solver"
        )
        ac = np.asarray(solver.ddim_alpha_cumprods)
        acp = np.asarray(solver.ddim_alpha_cumprods_prev)
        s = np.asarray(solver.ddim_scale_arr)
        sp = np.asarray(solver.ddim_scale_arr_prev)
        factor = np.prod(np.sqrt(acp / ac) * (sp / s))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(x) * factor, rtol=3e-4
        )
        with pytest.raises(NotImplementedError, match="scale"):
            ddim_sample_loop(lambda z, t: z, solver, x)  # sampler grid


class TestPSampleLoopMask:
    def test_masked_regions_track_x0(self):
        """With mask==1 everywhere the output is x0 renoised to t=0 == x0
        (plus no noise at t=0); with a half mask only the unmasked half is
        generated (ddpm3d.py:814-821)."""
        from t2v_turbo_tpu.diffusion import DiffusionSchedule, p_sample_loop

        sched = DiffusionSchedule.create(num_timesteps=20)
        model = lambda x, tb: 0.1 * x
        rng = np.random.RandomState(0)
        x_T = jnp.asarray(rng.randn(1, 8).astype(np.float32))
        x0 = jnp.asarray(rng.randn(1, 8).astype(np.float32))
        mask = jnp.concatenate([jnp.ones((1, 4)), jnp.zeros((1, 4))], axis=1)
        out = p_sample_loop(
            model, sched, x_T, jax.random.PRNGKey(1), mask=mask, x0=x0
        )
        # masked half equals q_sample(x0, t=0, .) = sqrt(abar_0) x0 + ...;
        # abar_0 ~ 1 so it's ~x0 up to the small t=0 noise term
        a0 = float(np.sqrt(np.asarray(sched.alphas_cumprod)[0]))
        s0 = float(np.sqrt(1 - np.asarray(sched.alphas_cumprod)[0]))
        diff = np.abs(np.asarray(out[:, :4]) - a0 * np.asarray(x0[:, :4]))
        assert diff.max() <= 4 * s0 + 1e-4
        # unmasked half is NOT x0
        assert float(jnp.abs(out[:, 4:] - x0[:, 4:]).max()) > 1e-2

    def test_mask_without_x0_raises(self):
        from t2v_turbo_tpu.diffusion import DiffusionSchedule, p_sample_loop

        sched = DiffusionSchedule.create(num_timesteps=5)
        with pytest.raises(ValueError, match="together"):
            p_sample_loop(
                lambda x, t: x, sched, jnp.zeros((1, 4)),
                jax.random.PRNGKey(0), mask=jnp.ones((1, 4)),
            )
