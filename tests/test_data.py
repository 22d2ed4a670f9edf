"""Dataset layer tests on a synthetic on-disk GraspNet-1B layout."""

import os

import numpy as np
import pytest

from graspnet_tpu.config import GraspNetConfig
from graspnet_tpu.data import dataset as ds
from graspnet_tpu.data.tolerance import generate_tolerance, tolerance_oracle


@pytest.fixture(scope="module")
def cfg():
    return GraspNetConfig.tiny()


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory, cfg):
    """Two scenes x 2 frames with the reference directory layout."""
    import scipy.io as scio
    from PIL import Image

    rng = np.random.default_rng(0)
    root = str(tmp_path_factory.mktemp("graspnet"))
    v, a, d = cfg.num_view, cfg.num_angle, cfg.num_depth
    h, w = 48, 64
    n_obj_total = 3

    os.makedirs(os.path.join(root, "grasp_label"))
    os.makedirs(os.path.join(root, "tolerance"))
    for i in range(n_obj_total):
        np_obj = 30
        np.savez(
            os.path.join(root, "grasp_label", f"{i:03d}_labels.npz"),
            points=rng.uniform(-0.04, 0.04, (np_obj, 3)).astype(np.float32),
            offsets=rng.uniform(0, 0.1, (np_obj, v, a, d, 3)).astype(np.float32),
            scores=rng.uniform(0, 1.2, (np_obj, v, a, d)).astype(np.float32),
        )
        np.save(
            os.path.join(root, "tolerance", f"{i:03d}_tolerance.npy"),
            rng.uniform(0, 0.05, (np_obj, v, a, d)).astype(np.float32),
        )

    for s in range(100, 102):
        scene = f"scene_{s:04d}"
        base = os.path.join(root, "scenes", scene, "kinect")
        for sub in ("rgb", "depth", "label", "meta"):
            os.makedirs(os.path.join(base, sub))
        n_frames = 2
        n_in_scene = 2
        coll = {
            f"arr_{i}": rng.random((30, v, a, d)) < 0.1 for i in range(n_in_scene)
        }
        os.makedirs(os.path.join(root, "collision_label", scene), exist_ok=True)
        np.savez(
            os.path.join(root, "collision_label", scene, "collision_labels.npz"),
            **coll,
        )
        for f in range(n_frames):
            depth = rng.integers(400, 800, (h, w)).astype(np.uint16)
            seg = np.zeros((h, w), dtype=np.uint8)
            seg[10:30, 10:30] = 1
            seg[30:45, 30:60] = 2
            Image.fromarray(depth).save(os.path.join(base, "depth", f"{f:04d}.png"))
            Image.fromarray(seg).save(os.path.join(base, "label", f"{f:04d}.png"))
            Image.fromarray(
                rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
            ).save(os.path.join(base, "rgb", f"{f:04d}.png"))
            poses = rng.normal(size=(3, 4, n_in_scene)).astype(np.float32)
            for i in range(n_in_scene):
                q = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
                if np.linalg.det(q) < 0:
                    q[:, 0] *= -1
                poses[:, :3, i] = q
                poses[:, 3, i] = rng.uniform(-0.1, 0.1, 3)
            scio.savemat(
                os.path.join(base, "meta", f"{f:04d}.mat"),
                {
                    "cls_indexes": np.array([[1], [2]], dtype=np.int32),
                    "poses": poses,
                    "intrinsic_matrix": np.array(
                        [[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]]
                    ),
                    "factor_depth": np.array([[1000.0]]),
                },
            )
    return root


class TestDataset:
    def test_load_grasp_labels(self, fake_root):
        valid, labels = ds.load_grasp_labels(fake_root, num_objects=3)
        assert valid == [1, 2, 3]
        assert labels[1][0].shape[1] == 3

    def test_get_data(self, fake_root, cfg):
        d = ds.GraspNetDataset(
            fake_root, camera="kinect", split="test_seen", num_points=cfg.num_point,
            load_label=False, cfg=cfg,
        )
        assert len(d) == 4  # 2 scenes x 2 frames
        sample = d.get_data(0)
        assert sample["point_clouds"].shape == (cfg.num_point, 3)

    def test_frame_cache_decodes_once_and_caps(self, fake_root, cfg):
        """The eval app reads each frame twice (get_data + get_raw_cloud);
        the LRU must serve the second read without re-decoding, evict
        beyond its cap, and hand back identical arrays."""
        d = ds.GraspNetDataset(
            fake_root, camera="kinect", split="test_seen",
            num_points=cfg.num_point, load_label=False, cfg=cfg,
        )
        calls = {"n": 0}
        orig = d._load_frame_uncached

        def counting(scene, frame):
            calls["n"] += 1
            return orig(scene, frame)

        d._load_frame_uncached = counting
        raw0 = d.get_raw_cloud(0)
        d.get_data(0)
        assert calls["n"] == 1  # second read was a cache hit
        np.testing.assert_array_equal(raw0, d.get_raw_cloud(0))
        assert calls["n"] == 1
        d._frame_cache_cap = 1
        d.get_data(1)  # evicts frame 0
        assert len(d._frame_cache) == 1
        d.get_raw_cloud(0)  # miss -> re-decode
        assert calls["n"] == 3

    def test_get_data_label_shapes(self, fake_root, cfg):
        valid, labels = ds.load_grasp_labels(fake_root, num_objects=3)
        d = ds.GraspNetDataset(
            fake_root, valid, labels, camera="kinect", split="test_seen",
            num_points=cfg.num_point, cfg=cfg, max_objects=4,
            remove_invisible=False, augment=True, label_mode="full",
        )
        s = d[0]
        ns, v, a, dd = cfg.num_seed, cfg.num_view, cfg.num_angle, cfg.num_depth
        assert s["point_clouds"].shape == (cfg.num_point, 3)
        assert s["objectness_label"].shape == (cfg.num_point,)
        assert s["grasp_labels"].shape == (ns, v, a, dd)
        assert s["grasp_points"].shape == (ns, 3)
        assert s["obj_view_rot"].shape == (4, v, 3, 3)
        assert s["sa_inds"]["sa1"].shape == (cfg.sa1.npoint,)

    def test_get_data_label_compact(self, fake_root, cfg):
        from graspnet_tpu.train.label_pipeline import IndexedSceneLabelContext

        valid, labels = ds.load_grasp_labels(fake_root, num_objects=3)
        d = ds.GraspNetDataset(
            fake_root, valid, labels, camera="kinect", split="test_seen",
            num_points=cfg.num_point, cfg=cfg, max_objects=4,
            remove_invisible=False, augment=True,  # label_mode default=compact
        )
        s = d[0]
        assert isinstance(s["label_ctx"], IndexedSceneLabelContext)
        assert s["label_ctx"].grasp_points.shape == (cfg.num_seed, 3)
        assert "grasp_labels" not in s  # no (Ns, V, A, D) slab materialized
        # collate keeps contexts as a plain list
        batch = ds.collate([d[0], d[1]])
        assert isinstance(batch["label_ctx"], list) and len(batch["label_ctx"]) == 2
        assert batch["point_clouds"].shape == (2, cfg.num_point, 3)

    def test_dataloader(self, fake_root, cfg):
        valid, labels = ds.load_grasp_labels(fake_root, num_objects=3)
        d = ds.GraspNetDataset(
            fake_root, valid, labels, camera="kinect", split="test_seen",
            num_points=cfg.num_point, cfg=cfg, max_objects=4,
            remove_invisible=False,
        )
        loader = ds.DataLoader(d, batch_size=2, num_workers=2)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0]["point_clouds"].shape == (2, cfg.num_point, 3)
        assert batches[0]["sa_inds"]["sa2"].shape == (2, cfg.sa2.npoint)

    def test_dataloader_shards_are_disjoint_and_cover(self):
        """Multi-host partition: identically-seeded shards must be disjoint
        per epoch and jointly cover the (truncated) permutation."""

        class IndexDataset:
            def __len__(self):
                return 13

            def __getitem__(self, i):
                return {"i": np.int64(i)}

        d = IndexDataset()
        seen = []
        for shard in range(3):
            loader = ds.DataLoader(
                d, batch_size=2, shuffle=True, num_workers=1, seed=7,
                num_shards=3, shard_index=shard, drop_last=False,
            )
            assert len(loader) == 2  # 13 // 3 = 4 local frames -> 2 batches
            idxs = np.concatenate([b["i"] for b in loader])
            assert len(idxs) == 4
            seen.append(idxs)
        flat = np.concatenate(seen)
        assert len(np.unique(flat)) == 12  # disjoint, covering 12 of 13

    def test_dataloader_set_epoch_immune_to_desync(self):
        """Epoch-pinned shuffle (VERDICT weak #7): hosts that iterated a
        DIFFERENT number of times still agree on the permutation once
        set_epoch is called, and shard disjointness holds per epoch."""

        class IndexDataset:
            def __len__(self):
                return 16

            def __getitem__(self, i):
                return {"i": np.int64(i)}

        d = IndexDataset()

        def make(shard):
            return ds.DataLoader(
                d, batch_size=2, shuffle=True, num_workers=1, seed=7,
                num_shards=2, shard_index=shard, drop_last=False,
            )

        a, b = make(0), make(1)
        # desynchronize: host b does an extra (e.g. eval) pass
        list(b)
        a.set_epoch(3)
        b.set_epoch(3)
        ia = np.concatenate([x["i"] for x in a])
        ib = np.concatenate([x["i"] for x in b])
        assert len(np.intersect1d(ia, ib)) == 0  # still disjoint
        assert len(np.union1d(ia, ib)) == 16  # still covering
        # same epoch again -> identical order (restart-safe)
        a2 = make(0)
        a2.set_epoch(3)
        np.testing.assert_array_equal(
            ia, np.concatenate([x["i"] for x in a2])
        )


class TestAugment:
    def test_flip_rotate_consistency(self, rng):
        """Augmented pose must map object points to augmented cloud frame."""
        cloud = rng.uniform(-0.3, 0.3, (100, 3)).astype(np.float32)
        q = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
        pose = np.concatenate([q, rng.uniform(-0.1, 0.1, (3, 1)).astype(np.float32)], 1)
        obj_pts = rng.uniform(-0.05, 0.05, (10, 3)).astype(np.float32)
        world_before = obj_pts @ pose[:, :3].T + pose[:, 3]

        g = np.random.default_rng(1)
        cloud_aug, poses_aug = ds.augment_flip_rotate(cloud, [pose], g)
        world_after = obj_pts @ poses_aug[0][:, :3].T + poses_aug[0][:, 3]
        # reconstruct the transform applied to the cloud and check it matches
        T, *_ = np.linalg.lstsq(cloud, cloud_aug, rcond=None)
        np.testing.assert_allclose(world_before @ T, world_after, atol=1e-4)


class TestTolerance:
    def test_matches_reference_oracle(self, rng):
        p, v, a, d = 12, 4, 3, 2
        points = rng.uniform(-0.03, 0.03, (p, 3)).astype(np.float32)
        scores = rng.uniform(0, 1.2, (p, v, a, d)).astype(np.float32)
        scores[rng.random((p, v, a, d)) < 0.3] = 0.0
        want = tolerance_oracle(points, scores)
        got = generate_tolerance(points, scores, chunk=8)
        np.testing.assert_allclose(got, want, atol=1e-6)
