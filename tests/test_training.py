"""Training step + multi-chip sharding tests (virtual 8-device CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechcatcher_tpu.config import tiny_config
from speechcatcher_tpu.models.asr_model import ASRModel
from speechcatcher_tpu.parallel.mesh import (
    make_mesh,
    param_specs,
    shard_batch,
    shard_params,
)
from speechcatcher_tpu.training import (
    TrainBatch,
    joint_loss,
    make_optimizer,
    train_step,
)

CFG = tiny_config(n_mels=20)


def make_batch(b=4, t=170, u=6, seed=0):
    rng = np.random.RandomState(seed)
    return TrainBatch(
        feats=jnp.asarray(rng.randn(b, t, CFG.n_mels).astype(np.float32)),
        feat_lens=jnp.full((b,), t, jnp.int32),
        tokens=jnp.asarray(
            rng.randint(2, CFG.vocab_size - 1, size=(b, u)).astype(np.int32)
        ),
        token_lens=jnp.full((b,), u, jnp.int32),
    )


def test_joint_loss_finite_and_decreases():
    model = ASRModel.random_init(CFG, seed=0)
    params = model.params
    batch = make_batch()
    opt = make_optimizer(lr=1e-2)
    opt_state = opt.init(params)

    loss0, metrics = joint_loss(params, batch, CFG)
    assert np.isfinite(float(loss0))
    assert float(metrics["ctc"]) > 0 and float(metrics["att"]) > 0

    for _ in range(5):
        params, opt_state, metrics = train_step(
            params, opt_state, batch, CFG, opt
        )
    assert float(metrics["loss"]) < float(loss0), (
        f"{float(metrics['loss'])} !< {float(loss0)}"
    )


def test_sharded_train_step_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest forces 8 virtual CPU devices"
    model = ASRModel.random_init(CFG, seed=1)
    batch = make_batch(b=8)
    opt = make_optimizer(lr=1e-3)

    # Single device.
    params1 = model.params
    s1 = opt.init(params1)
    p1, _, m1 = train_step(params1, s1, batch, CFG, opt)

    # dp=4 × tp=2 mesh.
    mesh = make_mesh(8, tp=2)
    with jax.set_mesh(mesh):
        params2 = shard_params(model.params, mesh)
        s2 = opt.init(params2)
        sb = shard_batch(batch, mesh)
        p2, _, m2 = train_step(params2, s2, sb, CFG, opt)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-4, atol=1e-5
    )
    # Spot-check an updated parameter.
    a = np.asarray(p1["encoder"]["after_norm"]["weight"])
    b = np.asarray(p2["encoder"]["after_norm"]["weight"])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_param_specs_cover_tree():
    model = ASRModel.random_init(CFG, seed=0)
    specs = param_specs(model.params)
    n_params = len(jax.tree.leaves(model.params))
    n_specs = len(jax.tree.leaves(
        specs, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)
    ))
    assert n_params == n_specs
