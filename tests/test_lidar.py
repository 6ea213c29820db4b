"""Lidar ray-cast op (reference config.py:145-150 declares the sensor;
here it is implemented as a batched observation op)."""

import numpy as np

import jax.numpy as jnp

from crowdnav_prediction_attngraph_tpu.config import Config, LidarConfig
from crowdnav_prediction_attngraph_tpu.env import lidar


def make_cfg(angular_res=5.0, rng=10.0):
    return Config(lidar=LidarConfig(angular_res=angular_res, range=rng))


def test_ray_count_and_default_range():
    cfg = make_cfg()
    assert lidar.num_rays(cfg) == 72
    out = lidar.scan(cfg, jnp.zeros(2), jnp.float32(0.0),
                     jnp.zeros((0, 2)), jnp.zeros((0,)), jnp.zeros((0,)))
    # no humans -> every ray returns max range
    np.testing.assert_allclose(out, 10.0)


def test_head_on_hit_distance():
    cfg = make_cfg(angular_res=90.0)  # rays at 0, 90, 180, 270 degrees
    pos = jnp.array([[3.0, 0.0]])
    rad = jnp.array([0.5])
    mask = jnp.ones((1,))
    out = np.asarray(lidar.scan(cfg, jnp.zeros(2), jnp.float32(0.0),
                                pos, rad, mask))
    # ray 0 (+x) hits the circle boundary at 2.5 m; others miss
    np.testing.assert_allclose(out[0], 2.5, atol=1e-6)
    np.testing.assert_allclose(out[1:], 10.0)


def test_heading_rotates_frame():
    cfg = make_cfg(angular_res=90.0)
    pos = jnp.array([[0.0, 4.0]])
    rad = jnp.array([1.0])
    mask = jnp.ones((1,))
    # robot facing +y: ray 0 points at the human
    out = np.asarray(lidar.scan(cfg, jnp.zeros(2), jnp.float32(np.pi / 2),
                                pos, rad, mask))
    np.testing.assert_allclose(out[0], 3.0, atol=1e-5)


def test_masked_and_behind_humans_ignored():
    cfg = make_cfg(angular_res=90.0)
    pos = jnp.array([[3.0, 0.0], [-2.0, 0.0]])
    rad = jnp.array([0.5, 0.5])
    # first human masked out; second is behind ray 0 but in front of ray 2
    mask = jnp.array([0.0, 1.0])
    out = np.asarray(lidar.scan(cfg, jnp.zeros(2), jnp.float32(0.0),
                                pos, rad, mask))
    np.testing.assert_allclose(out[0], 10.0)
    np.testing.assert_allclose(out[2], 1.5, atol=1e-6)


def test_batched_shapes():
    cfg = make_cfg()
    B, A = 4, 6
    rng = np.random.RandomState(0)
    out = lidar.scan(cfg,
                     jnp.asarray(rng.randn(B, 2)),
                     jnp.asarray(rng.randn(B)),
                     jnp.asarray(rng.randn(B, A, 2) * 3),
                     jnp.full((B, A), 0.3),
                     jnp.ones((B, A)))
    assert out.shape == (B, 72)
    assert np.all(np.asarray(out) > 0) and np.all(np.asarray(out) <= 10.0)


def test_range_clip():
    cfg = make_cfg(angular_res=90.0, rng=2.0)
    pos = jnp.array([[5.0, 0.0]])
    out = lidar.scan(cfg, jnp.zeros(2), jnp.float32(0.0), pos,
                     jnp.array([0.5]), jnp.ones((1,)))
    np.testing.assert_allclose(out, 2.0)  # hit at 4.5 m is beyond range
