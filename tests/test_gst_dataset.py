"""Benchmark dataset loader parity vs the reference TrajectoriesDataset
(gst_updated/src/mgnn/trajectories.py), plus eval-mode smoke tests."""

import os
import sys

import numpy as np
import pytest

from crowdnav_prediction_attngraph_tpu.models.gst import dataset as ds


def _synthetic_records(n_frames=60, frame_diff=10.0, seed=0):
    """eth-format rows (frame, ped, x, y) with peds entering/leaving."""
    rng = np.random.RandomState(seed)
    rows = []
    # 3 full-span peds + 4 partial-span peds
    spans = [(0, n_frames), (0, n_frames), (0, n_frames),
             (5, 25), (10, 40), (20, 55), (30, 42)]
    for pid, (s, e) in enumerate(spans):
        x0, y0 = rng.uniform(-5, 5, 2)
        vx, vy = rng.uniform(-0.2, 0.2, 2)
        for t in range(s, e):
            rows.append([t * frame_diff, float(pid + 1),
                         x0 + vx * t, y0 + vy * t])
    rows.sort(key=lambda r: (r[0], r[1]))
    return np.asarray(rows)


@pytest.fixture(scope="module")
def txt_path(tmp_path_factory):
    rec = _synthetic_records()
    p = tmp_path_factory.mktemp("ethlike") / "scene.txt"
    np.savetxt(p, rec, delimiter="\t")
    return str(p)


def _reference_dataset(txt_path, obs_len, pred_len, mode):
    sys.path.insert(0, "/root/reference/gst_updated")
    try:
        from src.mgnn.trajectories import TrajectoriesDataset
        return TrajectoriesDataset(
            os.path.dirname(txt_path), obs_seq_len=obs_len,
            pred_seq_len=pred_len, mode=mode, frame_diff=10.0)
    finally:
        sys.path.pop(0)


@pytest.mark.parametrize("mode", [None, "train", "val"])
def test_reference_windows_parity(txt_path, mode):
    """Same txt -> same window count, ped counts, masks, displacements,
    and (present-pair) edge values as the reference loader."""
    obs_len, pred_len = 5, 5
    ref = _reference_dataset(txt_path, obs_len, pred_len, mode)
    rec = ds.read_file(txt_path)
    ours = ds.reference_windows(rec, obs_len, pred_len, skip=1,
                                frame_diff=10.0, mode=mode)
    assert len(ours) == len(ref)
    for i in range(len(ref)):
        (obs_traj, pred_traj, obs_rel, pred_rel, lm_rel, lm,
         v_obs, A_obs, v_pred, A_pred, am_obs, am_pred) = ref[i]
        w = ours[i]
        P_ref = obs_traj.shape[0]
        # active slots in our padded window = reference ped count
        active = w["loss_mask"].sum(axis=1) > 0
        assert int(active.sum()) == P_ref
        # presence masks (reference loss_mask is (P, seq))
        np.testing.assert_array_equal(w["loss_mask"][:P_ref], lm.numpy())
        np.testing.assert_array_equal(w["loss_mask_rel"][:P_ref],
                                      lm_rel.numpy())
        # displacements where the rel mask is on
        v_ref = np.concatenate([v_obs.numpy(), v_pred.numpy()], axis=0)
        m = lm_rel.numpy().T[:, :, None]                    # (seq, P, 1)
        np.testing.assert_allclose(w["v"][:, :P_ref] * m, v_ref * m,
                                   atol=1e-5)
        # pairwise edges where both peds are PRESENT (the reference leaves
        # absent entries at raw -999-derived values; ours are zeroed)
        A_ref = np.concatenate([A_obs.numpy(), A_pred.numpy()], axis=0)
        present = w["loss_mask"][:P_ref].T                   # (seq, P)
        pair = present[:, :, None] * present[:, None, :]
        np.testing.assert_allclose(
            w["A"][:, :P_ref, :P_ref] * pair[..., None],
            A_ref * pair[..., None], atol=1e-5)
        # attention mask = outer(rel_mask) (trajectories.py:138-144)
        am_ref = np.concatenate([am_obs.numpy(), am_pred.numpy()], axis=0)
        np.testing.assert_array_equal(w["attn_mask"][:, :P_ref, :P_ref],
                                      am_ref)


def test_load_benchmark_layout_and_cache(tmp_path):
    rec = _synthetic_records()
    d = tmp_path / "eth_ucy" / "eth" / "test"
    d.mkdir(parents=True)
    np.savetxt(d / "scene.txt", rec, delimiter="\t")
    w1 = ds.load_benchmark("eth", str(tmp_path), "test",
                           obs_len=5, pred_len=5)
    assert len(w1) > 0
    assert (d / "eth_dset_test_o5p5s1mpall_windows.npz").exists()
    w2 = ds.load_benchmark("eth", str(tmp_path), "test",
                           obs_len=5, pred_len=5)  # cache hit
    assert len(w2) == len(w1)
    for a, b in zip(w1, w2):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def _synthetic_sdd_annotations(n_frames=600, seed=2):
    """Raw SDD annotation lines: track_id xmin ymin xmax ymax frame lost
    occluded generated "label" at 30 fps (only frame % 10 == 0 survives)."""
    rng = np.random.RandomState(seed)
    lines = []
    spans = [(0, n_frames), (0, n_frames), (100, 400), (200, 550)]
    for pid, (s, e) in enumerate(spans):
        x0, y0 = rng.uniform(100, 500, 2)
        vx, vy = rng.uniform(-2, 2, 2)
        for f in range(s, e):
            cx, cy = x0 + vx * f / 10, y0 + vy * f / 10
            lost = 1 if (pid == 2 and 250 <= f < 280) else 0
            lines.append(f'{pid + 1} {cx - 5:.1f} {cy - 7:.1f} {cx + 5:.1f} '
                         f'{cy + 7:.1f} {f} {lost} 0 0 "Pedestrian"')
    # a Car track and an off-grid frame line: both must be dropped
    lines.append('99 0 0 10 10 100 0 0 0 "Car"')
    return lines


@pytest.fixture(scope="module")
def sdd_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("sddraw")
    p = d / "annotations.txt"
    p.write_text("\n".join(_synthetic_sdd_annotations()) + "\n")
    return str(p)


def test_read_sdd_file_matches_reference(sdd_path):
    sys.path.insert(0, "/root/reference/gst_updated")
    try:
        from src.mgnn.trajectories_sdd import read_sdd_file as ref_read
        ref = ref_read(sdd_path)
    finally:
        sys.path.pop(0)
    ours = ds.read_sdd_file(sdd_path)
    np.testing.assert_allclose(ours, ref)
    assert not np.any(ours[:, 1] == 99)            # Car dropped
    assert np.all(ours[:, 0] % 10 == 0)            # every-10th-frame filter


@pytest.mark.parametrize("mode", ["train", "val", "test"])
def test_sdd_windows_parity(sdd_path, mode):
    """sdd raw annotations -> same windows as the reference's sdd
    TrajectoriesDataset, including its 80/10/10 mode split."""
    sys.path.insert(0, "/root/reference/gst_updated")
    try:
        from src.mgnn.trajectories_sdd import TrajectoriesDataset
        ref = TrajectoriesDataset(os.path.dirname(sdd_path), obs_seq_len=8,
                                  pred_seq_len=12, mode=mode,
                                  frame_diff=10.0)
    finally:
        sys.path.pop(0)
    rec = ds.read_sdd_file(sdd_path)
    ours = ds.reference_windows(rec, 8, 12, skip=1, frame_diff=10.0,
                                mode=mode, split_scheme="80/10/10")
    assert len(ours) == len(ref) > 0
    for i in range(len(ref)):
        (obs_traj, _pt, _or, _pr, lm_rel, lm, v_obs, _Ao, v_pred, _Ap,
         _amo, _amp) = ref[i]
        w = ours[i]
        P_ref = obs_traj.shape[0]
        np.testing.assert_array_equal(w["loss_mask"][:P_ref], lm.numpy())
        np.testing.assert_array_equal(w["loss_mask_rel"][:P_ref],
                                      lm_rel.numpy())
        v_ref = np.concatenate([v_obs.numpy(), v_pred.numpy()], axis=0)
        m = lm_rel.numpy().T[:, :, None]
        np.testing.assert_allclose(w["v"][:, :P_ref] * m, v_ref * m,
                                   atol=1e-4)


def test_load_benchmark_sdd_layout(tmp_path):
    d = tmp_path / "sdd" / "social_pool_data" / "test"
    d.mkdir(parents=True)
    (d / "annotations.txt").write_text(
        "\n".join(_synthetic_sdd_annotations()) + "\n")
    w = ds.load_benchmark("sdd", str(tmp_path), "test", obs_len=8,
                          pred_len=12, cache=False)
    assert len(w) > 0


def test_trajnet_loader(tmp_path):
    """trajnet++ ndjson scenes load into padded windows with the scene-start
    anchoring and mode split (reference trajectories_trajnet.py)."""
    import json
    d = tmp_path / "trajnet++" / "train"
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    lines = []
    # 10 scenes at starts 0, 10, ..., 90; frame_diff (e - s) / 20 = 1
    for i in range(10):
        s = i * 10
        lines.append({"scene": {"id": i, "p": 1, "s": s, "e": s + 20,
                                "fps": 2.5, "tag": [3, []]}})
    for pid in range(1, 4):
        x0, y0 = rng.uniform(-5, 5, 2)
        for f in range(0, 120):
            lines.append({"track": {"f": f, "p": pid,
                                    "x": x0 + 0.1 * f, "y": y0 - 0.05 * f}})
    with open(d / "synth_scenes.ndjson", "w") as fh:
        for ln in lines:
            fh.write(json.dumps(ln) + "\n")

    w_all = ds.load_benchmark("synth", str(tmp_path), None,
                              obs_len=8, pred_len=12)
    assert len(w_all) == 10
    w_train = ds.load_benchmark("synth", str(tmp_path), "train",
                                obs_len=8, pred_len=12)
    w_val = ds.load_benchmark("synth", str(tmp_path), "val",
                              obs_len=8, pred_len=12)
    assert len(w_train) == 8 and len(w_val) == 2
    v = w_all[0]["v"]
    assert v.shape[0] == 20
    # constant-velocity tracks -> constant displacements after frame 0
    active = w_all[0]["loss_mask"].sum(axis=1) > 0
    assert int(active.sum()) == 3
    np.testing.assert_allclose(v[1:, :3, 0], 0.1, atol=1e-5)


def test_eval_modes_run(tmp_path):
    """val + 20-sample test inference produce finite reference-normalized
    metrics on a tiny dataset with fresh params."""
    import jax
    from crowdnav_prediction_attngraph_tpu.config import PredConfig
    from crowdnav_prediction_attngraph_tpu.models.gst import eval as gst_eval
    from crowdnav_prediction_attngraph_tpu.models.gst import trainer

    rec = _synthetic_records(n_frames=30)
    p = tmp_path / "scene.txt"
    np.savetxt(p, rec, delimiter="\t")
    w = ds.reference_windows(ds.read_file(str(p)), 5, 5, frame_diff=10.0)
    assert w
    cfg = PredConfig()
    P = w[0]["v"].shape[1]
    params = trainer.init_params(cfg, jax.random.key(0), P)
    mv = gst_eval.evaluate_dataset(cfg, params, w, batch_size=2, mode="val")
    assert np.isfinite([mv["loss"], mv["aoe"], mv["foe"]]).all()
    mt = gst_eval.evaluate_dataset(cfg, params, w, batch_size=2, mode="test",
                                   num_samples=3)
    assert np.isfinite([mt["aoe"], mt["foe"], mt["aoe_std"],
                        mt["aoe_min"]]).all()
    assert mt["aoe_min"] <= mt["aoe"] + 1e-9
