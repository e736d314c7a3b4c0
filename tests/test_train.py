"""Training engine: loss decreases, NaN guard, optimizer split, DP mesh.

Engine-machinery tests (NaN guard, grad accumulation, LR control, DP
sharding) use a tiny stand-in module with the same output contract as the
codecs — XLA:CPU compiles the real codec's backward graph in minutes, so
exactly one test pays that cost (test_train_step_reduces_loss).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyres_tpu.models import LightWeightCheckerboard
from hyres_tpu.parallel import data_parallel_mesh, replicate, shard_batch
from hyres_tpu.train import (
    configure_optimizers,
    create_train_state,
    get_main_lr,
    make_eval_step,
    make_train_step,
    quantile_mask,
    set_main_lr,
)


class TinyCodec(nn.Module):
    """Minimal module honoring the codec forward/aux contract."""

    @nn.compact
    def __call__(self, x, noisequant=False, rng=None):
        h = nn.Conv(8, (3, 3), padding="SAME")(x)
        x_hat = nn.Conv(3, (3, 3), padding="SAME")(nn.relu(h))
        q = self.param("quantiles",
                       lambda k: jnp.array([[[-1.0, 0.1, 1.0]]] * 8))
        lik = jax.nn.sigmoid(h) * 0.98 + 0.01
        return {"x_hat": x_hat, "likelihoods": {"y": lik, "z": lik},
                "jpeg_bpp_loss": jnp.float32(0.0)}

    def aux_loss(self):
        q = self.get_variable("params", "quantiles")
        return jnp.sum(jnp.abs(q - jnp.array([-2.0, 0.0, 2.0])))


@pytest.fixture(scope="module")
def tiny():
    model = TinyCodec()
    x = jnp.zeros((2, 16, 16, 3))
    params = model.init(jax.random.key(0), x)
    main_tx, aux_tx = configure_optimizers(params, 1e-3, 1e-2)
    state = create_train_state(params, main_tx, aux_tx)
    step = make_train_step(model, main_tx, aux_tx, lmbda=0.01)
    return model, main_tx, aux_tx, state, step


def test_quantile_mask_partition():
    model = LightWeightCheckerboard(N=16, M=24)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                        noisequant=True, rng=jax.random.key(1))
    mask = quantile_mask(params)
    assert sum(jax.tree.leaves(mask)) == 1  # exactly the quantiles leaf
    assert params["params"]["entropy_bottleneck"]["quantiles"].shape[-1] == 3


def test_train_step_reduces_loss():
    """The one real-codec compile: full RD step end to end."""
    model = LightWeightCheckerboard(N=16, M=24)
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init(jax.random.key(0), x, noisequant=True,
                        rng=jax.random.key(1))
    main_tx, aux_tx = configure_optimizers(params, 1e-3, 1e-2)
    state = create_train_state(params, main_tx, aux_tx)
    step = make_train_step(model, main_tx, aux_tx, lmbda=0.01)
    batch = jax.random.uniform(jax.random.key(2), (2, 32, 32, 3))
    losses, aux_losses = [], []
    for i in range(15):
        state, m = step(state, batch, jax.random.key(i), True)
        losses.append(float(m["loss"]))
        aux_losses.append(float(m["aux_loss"]))
        assert float(m["skipped_nonfinite"]) == 0.0
    assert losses[-1] < losses[0]
    assert aux_losses[-1] < aux_losses[0]


def test_nan_guard_skips_update(tiny):
    model, main_tx, aux_tx, state, step = tiny
    bad = jnp.full((2, 16, 16, 3), jnp.nan)
    new_state, m = step(state, bad, jax.random.key(0), True)
    assert float(m["skipped_nonfinite"]) == 1.0
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(new_state.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_aux_optimizer_moves_only_quantiles(tiny):
    model, main_tx, aux_tx, state, step = tiny
    batch = jnp.zeros((2, 16, 16, 3))  # zero grads for main loss mse term
    new_state, m = step(state, batch, jax.random.key(0), True)
    q0 = np.asarray(state.params["params"]["quantiles"])
    q1 = np.asarray(new_state.params["params"]["quantiles"])
    assert not np.array_equal(q0, q1)  # aux loss moved the quantiles


def test_lr_get_set(tiny):
    model, main_tx, aux_tx, state, step = tiny
    assert abs(get_main_lr(state.main_state) - 1e-3) < 1e-9
    new_main = set_main_lr(state.main_state, 1e-4)
    assert abs(get_main_lr(new_main) - 1e-4) < 1e-9


def test_grad_accumulation_matches_full_batch():
    model = TinyCodec()
    x = jnp.zeros((4, 16, 16, 3))
    params = model.init(jax.random.key(0), x)
    main_tx, aux_tx = configure_optimizers(params, 1e-3, 1e-2, clip_max_norm=0.0)
    state = create_train_state(params, main_tx, aux_tx)
    batch = jax.random.uniform(jax.random.key(2), (4, 16, 16, 3))
    step1 = make_train_step(model, main_tx, aux_tx, lmbda=0.01, accum_steps=1)
    step2 = make_train_step(model, main_tx, aux_tx, lmbda=0.01, accum_steps=2)
    s1, m1 = step1(state, batch, jax.random.key(3), False)
    s2, m2 = step2(state, batch, jax.random.key(3), False)
    assert abs(float(m1["mse_loss"]) - float(m2["mse_loss"])) <= 1e-3 * abs(float(m1["mse_loss"])) + 1e-6
    # resulting params nearly identical (same averaged gradients)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_data_parallel_mesh_8_devices(tiny):
    assert len(jax.devices()) == 8  # conftest forces 8 virtual CPU devices
    model, main_tx, aux_tx, state, step = tiny
    mesh = data_parallel_mesh()
    state = replicate(mesh, state)
    batch = shard_batch(mesh, jax.random.uniform(jax.random.key(2), (8, 16, 16, 3)))
    new_state, m = step(state, batch, jax.random.key(3), True)
    assert np.isfinite(float(m["loss"]))
    p = jax.tree.leaves(new_state.params)[0]
    assert p.sharding.is_fully_replicated


def test_eval_step(tiny):
    model, main_tx, aux_tx, state, step = tiny
    ev = make_eval_step(model, lmbda=0.01)
    batch = jax.random.uniform(jax.random.key(4), (2, 16, 16, 3))
    d, out = ev(state.params, batch)
    assert np.isfinite(float(d["psnr"]))
    assert out["x_hat"].shape == batch.shape


def test_remat_step_matches_plain():
    """jax.checkpoint variant computes the same loss/update."""
    model = TinyCodec()
    x = jnp.zeros((2, 16, 16, 3))
    params = model.init(jax.random.key(0), x)
    main_tx, aux_tx = configure_optimizers(params, 1e-3, 1e-2)
    state = create_train_state(params, main_tx, aux_tx)
    batch = jax.random.uniform(jax.random.key(1), (2, 16, 16, 3))
    s_plain = make_train_step(model, main_tx, aux_tx, lmbda=0.01)
    s_remat = make_train_step(model, main_tx, aux_tx, lmbda=0.01, remat=True)
    st1, m1 = s_plain(state, batch, jax.random.key(2), False)
    st2, m2 = s_remat(state, batch, jax.random.key(2), False)
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    for a, b in zip(jax.tree.leaves(st1.params), jax.tree.leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_optimizer_partition_is_hard():
    """Each optimizer must be a strict no-op outside its own partition.

    Regression for a real bug: optax.masked passes non-masked leaves'
    gradients through UNCHANGED as updates, so apply_updates silently did
    gradient ASCENT on the other partition (quantiles corrupted by the
    main step; in refine training the whole 'frozen' codec drifted)."""
    import optax

    from hyres_tpu.models import LightWeightCheckerboard
    from hyres_tpu.train import configure_optimizers
    from hyres_tpu.train.optimizers import quantile_mask

    model = LightWeightCheckerboard(N=8, M=12)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                        noisequant=True, rng=jax.random.key(1))
    main_tx, aux_tx = configure_optimizers(params, 1e-4, 1e-3, 1.0)
    main_state = main_tx.init(params)
    aux_state = aux_tx.init(params)

    grads = jax.tree.map(jnp.ones_like, params)  # nonzero everywhere
    mask = quantile_mask(params)

    main_upd, _ = main_tx.update(grads, main_state, params)
    for u, m in zip(jax.tree.leaves(main_upd), jax.tree.leaves(mask)):
        if m:  # quantile leaves: MAIN update must be exactly zero
            assert float(jnp.abs(u).max()) == 0.0
        else:  # and the real partition must actually move
            assert float(jnp.abs(u).max()) > 0.0

    aux_upd, _ = aux_tx.update(grads, aux_state, params)
    for u, m in zip(jax.tree.leaves(aux_upd), jax.tree.leaves(mask)):
        if m:
            assert float(jnp.abs(u).max()) > 0.0
        else:  # non-quantile leaves: AUX update must be exactly zero
            assert float(jnp.abs(u).max()) == 0.0
