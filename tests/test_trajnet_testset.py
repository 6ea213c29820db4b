"""Trajnet++ testset loader + leaderboard prediction writer
(reference trajectories_trajnet_testset.py + the submission path
eval_trajnet.py targets). The reference loader needs the `ndjson` package
(absent here), so semantics are pinned against hand-built fixtures."""

import json

import numpy as np
import pytest

from crowdnav_prediction_attngraph_tpu.models.gst import dataset as ds


def _write_testset(path, obs_len=8, n_scenes=3, seed=0):
    """Scenes of obs_len+1 observed frames (the trajnet++ testset gives
    9 obs / 12 pred at frame_diff 12); ped 1 survives every frame, ped 2
    appears late, ped 99 only in a scene that should be dropped."""
    rng = np.random.RandomState(seed)
    fd = 12
    lines = []
    tracks = {}
    for sid in range(n_scenes):
        s = 100 + sid * 240
        lines.append({"scene": {"id": sid, "p": 1, "s": s, "e": s + 20 * fd,
                                "fps": 2.5, "tag": [3, []]}})
        for t in range(obs_len + 1):
            f = s + t * fd
            if sid < 2:        # scenes 0,1: ped 1 full-span
                tracks.setdefault((sid, 1), []).append(
                    (f, 1, 10.0 + t + sid, 20.0 + 0.5 * t))
            if sid == 0 and t >= 5:     # ped 2 partial
                tracks.setdefault((sid, 2), []).append(
                    (f, 2, -5.0 + t, 3.0))
            if sid == 2 and t % 2 == 0:  # scene 2: nobody survives all frames
                tracks.setdefault((sid, 99), []).append(
                    (f, 99, 0.0, 0.0))
    for v in tracks.values():
        for f, p, x, y in v:
            lines.append({"track": {"f": int(f), "p": int(p),
                                    "x": x, "y": y}})
    with open(path, "w") as fh:
        for ln in lines:
            fh.write(json.dumps(ln) + "\n")
    return str(path), fd


@pytest.fixture()
def testset(tmp_path):
    return _write_testset(tmp_path / "scene.ndjson")


def test_testset_windows(testset):
    path, fd = testset
    windows, metas = ds.trajnet_testset_windows(path, obs_len=8)
    # scene 2 dropped: no ped survives all obs_len+1 frames
    assert len(windows) == 2
    assert [m["scene_id"] for m in metas] == [0, 1]
    w, m = windows[0], metas[0]
    assert w["v"].shape[0] == 8                       # obs frames only
    assert m["frame_diff"] == fd
    assert m["last_frame"] == m["start_frame"] + 8 * fd
    # ped 1's displacement per frame is (1, 0.5) incl. the first obs step
    # (anchor-frame displacement, testset loader lines 102-109)
    j = list(m["ped_ids"]).index(1)
    np.testing.assert_allclose(w["v"][:, j], np.tile([1.0, 0.5], (8, 1)),
                               atol=1e-6)
    assert w["loss_mask_rel"][j].sum() == 8
    # ped 2 present from t>=5 -> displacements valid from its 2nd frame on
    j2 = list(m["ped_ids"]).index(2)
    assert w["loss_mask_rel"][j2].sum() == 3
    # last observed absolute positions recorded for the writer
    np.testing.assert_allclose(m["last_pos"][j], [10.0 + 8, 20.0 + 4.0])


def test_prediction_writer_roundtrip(testset, tmp_path):
    path, fd = testset
    windows, metas = ds.trajnet_testset_windows(path, obs_len=8)
    P = windows[0]["v"].shape[1]
    pred_len, S = 12, 3
    rng = np.random.RandomState(1)
    preds = [rng.randn(S, pred_len, P, 2) * 0.3 for _ in metas]
    out = tmp_path / "predictions.ndjson"
    ds.write_trajnet_predictions(str(out), metas, preds)
    rows = [json.loads(l) for l in open(out) if l.strip()]
    assert all("track" in r for r in rows)
    t0 = [r["track"] for r in rows if r["track"]["scene_id"] == 0]
    # every present ped gets S x pred_len rows
    n_present = int(metas[0]["last_present"].sum())
    assert len(t0) == S * pred_len * n_present
    # predicted frames continue past the last observed frame
    assert min(r["f"] for r in t0) == metas[0]["last_frame"] + fd
    assert max(r["f"] for r in t0) == metas[0]["last_frame"] + pred_len * fd
    assert sorted({r["prediction_number"] for r in t0}) == list(range(S))
    # absolute positions = last_pos + cumsum of displacements
    j = list(metas[0]["ped_ids"]).index(1)
    want = metas[0]["last_pos"][j] + np.cumsum(preds[0][0, :, j], axis=0)
    got = sorted(((r["f"], r["x"], r["y"]) for r in t0
                  if r["p"] == 1 and r["prediction_number"] == 0))
    np.testing.assert_allclose([g[1:] for g in got], want, atol=5e-3)


def test_single_sample_predictions(testset, tmp_path):
    path, _ = testset
    windows, metas = ds.trajnet_testset_windows(path, obs_len=8)
    P = windows[0]["v"].shape[1]
    preds = [np.zeros((12, P, 2))] * len(metas)       # (T, P, 2) no S axis
    out = tmp_path / "single.ndjson"
    ds.write_trajnet_predictions(str(out), metas, preds)
    rows = [json.loads(l)["track"] for l in open(out) if l.strip()]
    assert {r["prediction_number"] for r in rows} == {0}
