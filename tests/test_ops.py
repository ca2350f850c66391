"""Unit tests for schedules, running stats, and n-step returns.

The n-step return test checks the vectorised implementation against a direct
transcription of the reference double loop (`marlbase/utils/utils.py:38-63`)
in numpy.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from codebase_tpu.ops import epsilon_schedule, nstep_returns, RunningMeanStd


def reference_nstep(rewards, done, next_values, nsteps, gamma):
    """Direct numpy transcription of the reference double loop
    (`marlbase/utils/utils.py:48-63`), including the break-before-bootstrap."""
    ep_length = rewards.shape[0]
    out = np.zeros_like(rewards)
    for t_start in range(ep_length):
        acc = np.zeros_like(rewards[0])
        for step in range(nsteps + 1):
            t = t_start + step
            if t >= ep_length:
                break
            elif step == nsteps:
                acc += gamma**step * next_values[t] * (1 - done[t])
            else:
                acc += gamma**step * rewards[t] * (1 - done[t])
        out[t_start] = acc
    return out


class TestEpsilonSchedule:
    def test_linear_endpoints(self):
        sched = epsilon_schedule("linear", 0.5, 1.0, 0.05, 6.5, 1000)
        assert float(sched(0)) == pytest.approx(1.0)
        assert float(sched(250)) == pytest.approx(0.525)
        assert float(sched(500)) == pytest.approx(0.05)
        assert float(sched(900)) == pytest.approx(0.05)

    def test_exponential_floor(self):
        sched = epsilon_schedule("exp", 0.5, 1.0, 0.05, 6.5, 1000)
        assert float(sched(0)) == pytest.approx(1.0)
        assert float(sched(10**6)) == pytest.approx(0.05)
        # strictly decreasing early on
        assert float(sched(10)) > float(sched(50))

    def test_invalid_style(self):
        with pytest.raises(ValueError):
            epsilon_schedule("cosine", 0.5, 1.0, 0.05, 6.5, 1000)


class TestRunningMeanStd:
    def test_matches_batch_moments(self):
        rng = np.random.default_rng(0)
        rms = RunningMeanStd.init((3,))
        chunks = [rng.normal(size=(50, 3)).astype(np.float32) * 2 + 1 for _ in range(4)]
        for c in chunks:
            rms = rms.update(jnp.asarray(c))
        allc = np.concatenate(chunks)
        np.testing.assert_allclose(np.asarray(rms.mean), allc.mean(0), atol=1e-3)
        # merging unbiased per-chunk variances (torch.var default, which the
        # reference uses) biases the merged estimate slightly high vs the
        # population variance — same behaviour as the reference
        np.testing.assert_allclose(np.asarray(rms.var), allc.var(0), rtol=5e-2)

    def test_normalise_roundtrip(self):
        rms = RunningMeanStd.init((2,))
        rms = rms.update(jnp.arange(20, dtype=jnp.float32).reshape(10, 2))
        x = jnp.asarray([[3.0, 4.0]])
        np.testing.assert_allclose(
            np.asarray(rms.denormalise(rms.normalise(x))), np.asarray(x), rtol=1e-5
        )


class TestNStepReturns:
    @pytest.mark.parametrize("nsteps", [1, 3, 5, 10])
    def test_matches_reference_loop(self, nsteps):
        rng = np.random.default_rng(nsteps)
        T, B, N = 12, 4, 2
        rewards = rng.normal(size=(T, B, N)).astype(np.float32)
        values = rng.normal(size=(T + 1, B, N)).astype(np.float32)
        # Episodes terminate at random times; done[t] = "state t terminal"
        done = np.zeros((T + 1, B, N), dtype=np.float32)
        for b in range(B):
            t_end = rng.integers(2, T + 1)
            done[t_end:, b, :] = 1.0
        expected = reference_nstep(rewards, done, values, nsteps, 0.99)
        got = np.asarray(
            nstep_returns(jnp.asarray(rewards), jnp.asarray(done), jnp.asarray(values), nsteps, 0.99)
        )
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_no_done_bootstrap(self):
        # Single reward stream, check the closed form for n=2
        T = 4
        r = jnp.ones((T, 1, 1))
        v = 10.0 * jnp.ones((T + 1, 1, 1))
        d = jnp.zeros((T + 1, 1, 1))
        out = np.asarray(nstep_returns(r, d, v, 2, 0.5))[:, 0, 0]
        # R_0 = R_1 = 1 + .5 + .25*10 = 4.0; the last nsteps positions never
        # bootstrap (reference breaks at t >= T): R_2 = 1.5, R_3 = 1.0
        np.testing.assert_allclose(out, [4.0, 4.0, 1.5, 1.0], atol=1e-6)


class TestClipMask:
    def test_masked_clip_scopes_norm_and_scaling_to_critic(self):
        """Reference clip scope (`dqn/model.py:170`): clip_grad_norm_ touches
        ONLY critic.parameters() — the mixer's grads are neither counted in
        the global norm nor scaled. make_optimizer(clip_mask=...) must
        reproduce exactly that (the round-4 QMIX gate divergence)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from codebase_tpu.algos.common import make_optimizer

        params = {
            "critic": {"w": jnp.zeros((3,))},
            "mixer": {"w": jnp.zeros((3,))},
        }
        grads = {
            "critic": {"w": jnp.asarray([3.0, 4.0, 0.0])},  # norm 5
            "mixer": {"w": jnp.asarray([30.0, 40.0, 0.0])},  # norm 50 (ignored)
        }
        opt = make_optimizer(
            "SGD", 1.0, grad_clip=1.0, clip_mask={"critic": True, "mixer": False}
        )
        upd, _ = opt.update(grads, opt.init(params), params)
        # critic scaled by 1/5 (its OWN norm, not the joint norm sqrt(5^2+50^2))
        np.testing.assert_allclose(
            np.asarray(upd["critic"]["w"]), [-0.6, -0.8, 0.0], atol=1e-6
        )
        # mixer passes through unclipped
        np.testing.assert_allclose(
            np.asarray(upd["mixer"]["w"]), [-30.0, -40.0, 0.0], atol=1e-5
        )

    def test_unmasked_clip_uses_joint_norm(self):
        import jax.numpy as jnp
        import numpy as np

        from codebase_tpu.algos.common import make_optimizer

        params = {"a": jnp.zeros((2,)), "b": jnp.zeros((2,))}
        grads = {"a": jnp.asarray([3.0, 0.0]), "b": jnp.asarray([4.0, 0.0])}
        opt = make_optimizer("SGD", 1.0, grad_clip=1.0)
        upd, _ = opt.update(grads, opt.init(params), params)
        np.testing.assert_allclose(np.asarray(upd["a"]), [-0.6, 0.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(upd["b"]), [-0.8, 0.0], atol=1e-6)
