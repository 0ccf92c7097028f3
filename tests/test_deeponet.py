"""DeepONet + backstepping kernel tests."""
import jax
import jax.numpy as jnp
import numpy as np

from pde_policylearning_tpu.models.deeponet import DeepONetCartesianProd


def test_deeponet_shapes_and_grad():
    model = DeepONetCartesianProd(branch_layers=(16, 8),
                                  trunk_layers=(16, 8))
    u = jax.random.normal(jax.random.PRNGKey(0), (4, 10))
    coords = jax.random.normal(jax.random.PRNGKey(1), (25, 2))
    params = model.init(jax.random.PRNGKey(2), u, coords)["params"]
    out = model.apply({"params": params}, u, coords)
    assert out.shape == (4, 25)

    g = jax.grad(lambda p: jnp.mean(
        model.apply({"params": p}, u, coords) ** 2))(params)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(g))


def test_backstepping_closed_form():
    import run_learning_beta_to_k as bk
    # small-z limit: I1(z)/z -> 1/2, so k(x,y) -> -lam*y/2
    k = bk.backstepping_kernel(1e-6, np.array([[0.5]]), np.array([[0.3]]))
    np.testing.assert_allclose(k, -1e-6 * 0.3 / 2, rtol=1e-4)
    # kernel vanishes at y=0
    k0 = bk.backstepping_kernel(5.0, np.array([[0.7]]), np.array([[0.0]]))
    assert abs(k0[0, 0]) < 1e-12


def test_deeponet_learns_linear_operator():
    # learn the identity-ish operator u -> mean(u) * ones
    model = DeepONetCartesianProd(branch_layers=(32, 16),
                                  trunk_layers=(32, 16))
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)
    coords = jnp.asarray(rng.normal(size=(5, 2)), jnp.float32)
    y = jnp.broadcast_to(jnp.mean(u, axis=1, keepdims=True), (64, 5))
    params = model.init(jax.random.PRNGKey(0), u, coords)["params"]
    import optax
    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(
            lambda pp: jnp.mean(
                (model.apply({"params": pp}, u, coords) - y) ** 2))(p)
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s, loss

    for _ in range(200):
        params, state, loss = step(params, state)
    assert float(loss) < 0.05
