"""Differentiable-coefficient executors: parity with the static path and an
end-to-end coefficient-fitting optimization."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from recfilter_tpu import coeffs, learnable, scan_core
from recfilter_tpu.spec import BorderMode, Dim, FilterSpec, Scan

CASES = [
    (1.0, [1.0]),
    (1.2, [0.8, -0.3]),
    (0.9, [0.6, 0.25, -0.1]),
]


@pytest.mark.parametrize("feedfwd,feedback", CASES)
@pytest.mark.parametrize("clamp", [False, True])
def test_impulse_matrix_jnp_matches_static(feedfwd, feedback, clamp):
    got = np.asarray(
        learnable.impulse_matrix_jnp(
            jnp.asarray(feedfwd), jnp.asarray(feedback), 12, clamp
        )
    )
    want = coeffs.impulse_matrix(feedfwd, feedback, 12, clamp)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("feedfwd,feedback", CASES)
def test_state_matrix_jnp_matches_static(feedfwd, feedback):
    got = np.asarray(
        learnable.state_matrix_jnp(jnp.asarray(feedback), 12)
    )
    want = coeffs.state_matrix(feedback, 12)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("border", [BorderMode.ZERO, BorderMode.CLAMP])
def test_learnable_scan_matches_oracle(causal, border):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 20)).astype(np.float32)
    got = np.asarray(
        learnable.apply_scan_learnable(
            jnp.asarray(x), 1, causal, jnp.asarray(0.9),
            jnp.asarray([0.6, 0.25]), tile_width=6, border=border,
        )
    )
    want = scan_core.oracle_apply_scan(
        x, 1, causal, 0.9, [0.6, 0.25], border
    ).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gradients_wrt_coefficients_match_finite_difference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 16)).astype(np.float32))

    def loss(a):
        y = learnable.apply_scan_learnable(
            x, 1, True, jnp.asarray(1.0), a, tile_width=4
        )
        return (y**2).mean()

    a0 = jnp.asarray([0.5, 0.2])
    g = jax.grad(loss)(a0)
    for i in range(2):
        eps = 1e-3
        d = jnp.zeros(2).at[i].set(eps)
        fd = (loss(a0 + d) - loss(a0 - d)) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=5e-2, atol=1e-4)


def test_fit_coefficients_recovers_target():
    """Train a 1st-order filter's coefficients to match a target filter's
    output — the learnable-layer story end to end."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))
    spec = FilterSpec(
        "L", (Dim("r", 8), Dim("c", 32)), (Scan(1, True, 1.0, (0.5,)),)
    )
    model = learnable.LearnableRecFilter(spec, tile_width=8)
    target_params = {"scan0": {"b0": jnp.asarray(0.7), "a": jnp.asarray([0.6])}}
    target = model.apply(target_params, x)

    params = model.init_params()  # starts at b0=1.0, a=0.5
    opt = optax.adam(3e-2)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            return ((model.apply(p, x) - target) ** 2).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, loss

    for _ in range(300):
        params, state, loss = step(params, state)
    assert float(loss) < 1e-5
    np.testing.assert_allclose(
        float(params["scan0"]["b0"]), 0.7, atol=2e-2
    )
    np.testing.assert_allclose(
        float(params["scan0"]["a"][0]), 0.6, atol=2e-2
    )
