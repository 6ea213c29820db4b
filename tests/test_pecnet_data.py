"""PECNet social-pool tooling vs the reference's live social_utils.py
(imported from /root/reference, as the other parity tests do)."""

import os
import sys

import numpy as np
import pytest

from crowdnav_prediction_attngraph_tpu.models.gst import pecnet_data as pd


def _ref_social_utils():
    sys.path.insert(0, "/root/reference/gst_updated")
    try:
        from src.pec_net import social_utils
        return social_utils
    finally:
        sys.path.pop(0)


def _synthetic_scene(path, n_tracks=12, seed=0):
    """Scene txt rows: frame_id person_id x y (space-delimited), 20-frame
    tracks in two spatial clusters so the social filter forms >1 group."""
    rng = np.random.RandomState(seed)
    rows = []
    for pid in range(1, n_tracks + 1):
        cluster = 0 if pid <= n_tracks // 2 else 1
        x0 = rng.uniform(0, 50) + cluster * 1000.0
        y0 = rng.uniform(0, 50) + cluster * 1000.0
        t0 = rng.choice([0, 12, 600])      # some tracks far apart in time
        for t in range(20):
            rows.append([t0 + 12 * t, pid,
                         x0 + rng.uniform(-1, 1) * t,
                         y0 + rng.uniform(-1, 1) * t])
    np.savetxt(path, np.asarray(rows), delimiter=" ")
    return str(path)


@pytest.fixture(scope="module")
def scene_txt(tmp_path_factory):
    return _synthetic_scene(tmp_path_factory.mktemp("pecnet") / "scene.txt")


def test_filters_match_reference(scene_txt):
    su = _ref_social_utils()
    data = np.loadtxt(scene_txt, delimiter=" ")
    by_id = {}
    for frame_id, person_id, x, y in data:
        by_id.setdefault(person_id, []).append([person_id, frame_id, x, y])
    keys = list(by_id.keys())
    for a in keys[:6]:
        for b in keys[6:]:
            t1, t2 = np.asarray(by_id[a]), np.asarray(by_id[b])
            assert pd.find_min_time(t1[:, 1], t2[:, 1]) == \
                su.find_min_time(t1[:, 1], t2[:, 1])
            assert np.isclose(
                pd.find_min_dist(t1[:, 2], t1[:, 3], t2[:, 2], t2[:, 3]),
                su.find_min_dist(t1[:, 2], t1[:, 3], t2[:, 2], t2[:, 3]))
            assert pd.social_and_temporal_filter(t1, t2, 48, 100) == \
                su.social_and_temporal_filter(a, b, by_id, 48, 100)


def test_social_batches_match_reference(scene_txt, tmp_path, monkeypatch):
    """Same txt -> identical greedy social batches and masks as the
    reference collect_data (driven through its glob-based entry)."""
    su = _ref_social_utils()
    # reference collect_data reads root_path + /trajnet_image/train/stanford
    root = tmp_path / "ref_root"
    d = root / "trajnet_image" / "train" / "stanford"
    d.mkdir(parents=True)
    import shutil
    shutil.copy(scene_txt, d / "scene_A.txt")
    ref_ds, ref_masks = su.collect_data(
        "train", batch_size=8, time_thresh=48, dist_tresh=100,
        verbose=False, root_path=str(root))
    got_ds, got_masks = pd.collect_social_batches(
        [scene_txt], batch_size=8, time_thresh=48, dist_thresh=100)
    assert len(got_ds) == len(ref_ds)
    for g, r in zip(got_ds, ref_ds):
        np.testing.assert_allclose(np.asarray(g, float),
                                   np.asarray(r, float))
    for g, r in zip(got_masks, ref_masks):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_pickle_roundtrip_and_social_dataset_semantics(scene_txt, tmp_path):
    ds, masks = pd.collect_social_batches([scene_txt], batch_size=8)
    p = tmp_path / "train_all_8_48_100.pickle"
    pd.save_social_pickle(str(p), ds, masks)
    out = pd.load_social_pickle(str(p), set_name="train")
    # train: reversed-tracklet augmentation doubles the batches
    assert len(out["trajectory_batches"]) == 2 * len(ds)
    fwd = out["trajectory_batches"][0]
    rev = out["trajectory_batches"][1]
    np.testing.assert_allclose(fwd, np.flip(rev, axis=1))
    assert fwd.shape[-1] == 2                       # ids stripped
    # initial positions = index-7 position / 1000 (social_utils.py:152-158)
    np.testing.assert_allclose(out["initial_pos_batches"][0],
                               fwd[:, 7, :] / 1000)
    out_t = pd.load_social_pickle(str(p), set_name="test")
    assert len(out_t["trajectory_batches"]) == len(ds)


def test_split_square_block_matrix():
    su = _ref_social_utils()
    m = np.zeros((6, 6), int)
    for blk in ((0, 1, 2), (3,), (4, 5)):
        idx = np.asarray(blk)
        m[np.ix_(idx, idx)] = 1
    assert pd.split_square_block_matrix(m) == [3, 1, 2]
    assert pd.split_square_block_matrix(m) == su.split_square_block_matrix(m)
