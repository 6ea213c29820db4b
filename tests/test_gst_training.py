"""GST pipeline integration: collect data from the sim -> build dataset ->
train a few steps -> loss decreases. Mirrors the reference pipeline
collect_data.py -> mgnn datasets -> gst train.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crowdnav_prediction_attngraph_tpu.config import PredConfig, varnum_config
from crowdnav_prediction_attngraph_tpu.collect_data import collect_dataset
from crowdnav_prediction_attngraph_tpu.models.gst import dataset as ds
from crowdnav_prediction_attngraph_tpu.models.gst import trainer


@pytest.fixture(scope="module")
def records():
    cfg = varnum_config(human_num=4)
    data = collect_dataset(cfg, num_envs=2, tot_steps=64, seed=0, chunk=32)
    return data


def test_collect_produces_valid_records(records):
    total = sum(len(d) for d in records)
    assert total > 50
    arr = np.asarray(records[0])
    assert arr.shape[1] == 4
    # frames increase, ids are non-negative, positions in-arena-ish
    assert np.all(np.diff(np.unique(arr[:, 0])) > 0)
    assert np.all(arr[:, 1] >= 0)
    assert np.all(np.abs(arr[:, 2:]) < 30)


def test_windows_and_training_step(records):
    arr = np.asarray(records[0])
    windows = ds.build_windows(arr, obs_len=5, pred_len=5, max_peds=8)
    assert len(windows) > 3
    w = windows[0]
    assert w["v"].shape == (10, 8, 2)
    assert w["A"].shape == (10, 8, 8, 2)
    # displacements consistent with masks
    assert np.all(np.abs(w["v"][w["loss_mask_rel"].T.astype(bool)]) < 2.0)

    cfg = PredConfig()
    params = trainer.init_params(cfg, jax.random.key(0), max_peds=8)
    tx = trainer.make_optimizer(1e-3, 100, 1)
    opt_state = tx.init(params)
    step = trainer.make_train_step(cfg, tx, deterministic_loss=False)
    rng = np.random.RandomState(0)
    losses = []
    for it in range(8):
        for batch in ds.batches(windows, min(4, len(windows)), rng):
            batch = jax.tree.map(jnp.asarray, batch)
            params, opt_state, loss, (aoe_sum, foe_sum, n_full) = step(
                params, opt_state, batch, 0.5, jax.random.key(it))
            assert float(n_full) >= 0
            losses.append(float(loss))
            break
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"GST loss did not decrease: {losses}"


def test_rotation_augmentation(records):
    arr = np.asarray(records[0])
    windows = ds.build_windows(arr, obs_len=5, pred_len=5, max_peds=8)
    rng = np.random.RandomState(0)
    batch = next(ds.batches(windows, min(4, len(windows)), rng))
    v = jnp.asarray(batch["v"]); A = jnp.asarray(batch["A"])
    B = v.shape[0]
    # theta = 0 is the identity
    v0, A0 = trainer.rotate_graph(v, A, jnp.zeros((B,)))
    np.testing.assert_allclose(v0, v, atol=1e-6)
    np.testing.assert_allclose(A0, A, atol=1e-6)
    # theta = pi/2 maps (x, y) -> (-y, x)
    v9, A9 = trainer.rotate_graph(v, A, jnp.full((B,), jnp.pi / 2))
    np.testing.assert_allclose(v9[..., 0], -v[..., 1], atol=1e-6)
    np.testing.assert_allclose(v9[..., 1], v[..., 0], atol=1e-6)
    np.testing.assert_allclose(A9[..., 0], -A[..., 1], atol=1e-6)
    # rotations preserve norms (pairwise distances / speeds unchanged)
    rb = trainer.random_rotate_batch(
        {"v": v, "A": A}, jax.random.key(3), "random")
    np.testing.assert_allclose(np.linalg.norm(rb["v"], axis=-1),
                               np.linalg.norm(v, axis=-1), atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(rb["A"], axis=-1),
                               np.linalg.norm(A, axis=-1), atol=1e-5)
    # right_angle pattern draws multiples of pi/2: x/y components stay on grid
    rb2 = trainer.random_rotate_batch(
        {"v": v, "A": A}, jax.random.key(4), "right_angle")
    mag = np.linalg.norm(rb2["v"], axis=-1)
    comp = np.abs(rb2["v"])
    assert np.all((np.isclose(comp[..., 0], 0, atol=1e-5)
                   | np.isclose(comp[..., 0], mag, atol=1e-5))
                  | (comp[..., 0] <= mag + 1e-5))


def test_trainer_resume_parity(records, tmp_path):
    """Training 4 epochs straight == 2 epochs + resume for 2 more
    (the reference restores Adam/LR/temperature schedulers on resume,
    gst train.py:59-98)."""
    arr = np.asarray(records[0])
    windows = ds.build_windows(arr, obs_len=5, pred_len=5, max_peds=8)
    cfg = PredConfig()
    kw = dict(epochs=4, temp_epochs=4, lr=1e-3, batch_size=4, seed=7,
              save_epochs=2, max_peds=8, rotation_pattern="random")
    p_straight, _ = trainer.train(cfg, windows, windows[:4],
                                  str(tmp_path / "a"), **kw)
    trainer.train(cfg, windows, windows[:4], str(tmp_path / "b"),
                  **{**kw, "epochs": 2})
    p_resumed, _ = trainer.train(cfg, windows, windows[:4],
                                 str(tmp_path / "b"), **kw, resume_epoch=2)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
                 p_straight, p_resumed)
    # tfevents sidecar (reference tensorboardX scalars, gst train.py:192-194)
    tb = tmp_path / "a" / "tensorboard"
    assert any(f.name.startswith("events.out.tfevents")
               for d in [tb, *tb.iterdir()] if d.is_dir()
               for f in d.iterdir())


def test_fused_epoch_matches_host_loop(records, tmp_path):
    """The on-device lax.scan epoch (trainer.make_epoch_fns) runs the same
    micro-batch Adam sequence as the per-batch host loop: same shuffle
    permutation, same fold_in(ekey, i) step keys, same remainder-val batch
    — so params and history agree to float tolerance."""
    arr = np.asarray(records[0])
    windows = ds.build_windows(arr, obs_len=5, pred_len=5, max_peds=8)
    # odd-sized val split to exercise the remainder-batch path
    val = windows[:5]
    cfg = PredConfig()
    kw = dict(epochs=2, temp_epochs=4, lr=1e-3, batch_size=4, seed=11,
              save_epochs=10, max_peds=8, rotation_pattern="random")
    p_fused, h_fused = trainer.train(cfg, windows, val,
                                     str(tmp_path / "fused"), **kw,
                                     fused_epochs=True)
    p_host, h_host = trainer.train(cfg, windows, val,
                                   str(tmp_path / "host"), **kw,
                                   fused_epochs=False)
    # XLA fuses the scan body differently from the standalone step program,
    # so per-step float reassociation (amplified by Adam's 1/sqrt(v)) leaves
    # ~1e-4-scale residue after 2 epochs; the update SEQUENCE is identical.
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=3e-4),
                 p_fused, p_host)
    for k in h_fused:
        np.testing.assert_allclose(h_fused[k], h_host[k], rtol=2e-3,
                                   atol=2e-4, err_msg=k)


def test_temperature_schedule():
    # temperature_scheduler.py:12-20 endpoints
    assert trainer.temperature(0, 100, 0.5) == pytest.approx(0.5)
    assert trainer.temperature(100, 100, 0.5) == pytest.approx(0.03)
    assert trainer.temperature(200, 100, 0.5) == pytest.approx(0.03)
