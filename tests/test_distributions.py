"""Torch-oracle parity for the Categorical/Bernoulli action heads.

Reference: rl/networks/distributions.py:18-57 (FixedCategorical /
FixedBernoulli semantics). These heads are unused by every shipped reference
config (Box action space -> DiagGaussian) but belong to the public API.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from crowdnav_prediction_attngraph_tpu.models import distributions as D


@pytest.fixture(scope="module")
def logits():
    rng = np.random.default_rng(0)
    return rng.normal(size=(16, 5)).astype(np.float32)


def test_categorical_matches_torch(logits):
    t = torch.distributions.Categorical(logits=torch.from_numpy(logits))
    actions = np.array([[i % 5] for i in range(16)], dtype=np.int64)

    lp = D.categorical_log_prob(jnp.asarray(logits), jnp.asarray(actions))
    # FixedCategorical.log_probs: log_prob(actions.squeeze(-1)) summed -> (B,1)
    lp_t = t.log_prob(torch.from_numpy(actions).squeeze(-1)).unsqueeze(-1)
    np.testing.assert_allclose(np.asarray(lp), lp_t.numpy(), atol=1e-5)

    ent = D.categorical_entropy(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(ent), t.entropy().numpy(), atol=1e-5)

    md = D.categorical_mode(jnp.asarray(logits))
    md_t = t.probs.argmax(dim=-1, keepdim=True)
    np.testing.assert_array_equal(np.asarray(md), md_t.numpy())

    s = D.categorical_sample(jax.random.PRNGKey(0), jnp.asarray(logits))
    assert s.shape == (16, 1)
    assert int(s.min()) >= 0 and int(s.max()) < 5


def test_bernoulli_matches_torch(logits):
    t = torch.distributions.Bernoulli(logits=torch.from_numpy(logits))
    actions = (np.arange(16 * 5).reshape(16, 5) % 2).astype(np.float32)

    lp = D.bernoulli_log_prob(jnp.asarray(logits), jnp.asarray(actions))
    # FixedBernoulli.log_probs: per-dim log_prob, view(B,-1).sum(-1,keepdim)
    lp_t = t.log_prob(torch.from_numpy(actions)).view(16, -1).sum(-1, keepdim=True)
    np.testing.assert_allclose(np.asarray(lp), lp_t.numpy(), atol=1e-5)

    ent = D.bernoulli_entropy(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(ent), t.entropy().sum(-1).numpy(),
                               atol=1e-5)

    md = D.bernoulli_mode(jnp.asarray(logits))
    md_t = torch.gt(t.probs, 0.5).float()
    np.testing.assert_array_equal(np.asarray(md), md_t.numpy())

    s = D.bernoulli_sample(jax.random.PRNGKey(0), jnp.asarray(logits))
    assert s.shape == (16, 5)
    assert set(np.unique(np.asarray(s))) <= {0.0, 1.0}


def test_head_modules_init_shapes(logits):
    x = jnp.asarray(logits)
    cat = D.CategoricalParams(num_outputs=7)
    p = cat.init(jax.random.PRNGKey(1), x)
    assert cat.apply(p, x).shape == (16, 7)
    # orthogonal gain 0.01 (reference distributions.py:62-67)
    k = np.asarray(p["params"]["linear"]["kernel"])
    np.testing.assert_allclose(np.linalg.svd(k, compute_uv=False), 0.01,
                               rtol=1e-4)

    ber = D.BernoulliParams(num_outputs=3)
    p = ber.init(jax.random.PRNGKey(2), x)
    assert ber.apply(p, x).shape == (16, 3)
