"""Telemetry, checkpoint/resume, config loading."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from fast_limo_tpu.models import pipeline as pl
from fast_limo_tpu.utils import checkpoint as ckpt
from fast_limo_tpu.utils.config import Config
from fast_limo_tpu.utils.telemetry import Telemetry

import __graft_entry__ as ge


class TestConfig:
    def test_defaults_match_reference_loader(self):
        # defaults from src/main.cpp:101-168
        cfg = Config()
        assert cfg.ikfom.MAX_NUM_ITERS == 3
        assert cfg.ikfom.mapping.NUM_MATCH_POINTS == 5
        assert cfg.ikfom.mapping.octree.bucket_size == 2
        assert cfg.ikfom.LIMITS == 1e-3
        assert cfg.sensor_type == 1

    def test_loads_reference_kitti_yaml(self):
        cfg = Config.from_yaml("/root/reference/config/kitti.yaml")
        assert cfg.sensor_type == 1
        assert cfg.filters.voxel_active
        assert cfg.filters.leafSize[0] == 1.0
        assert cfg.ikfom.mapping.MAX_NUM_MATCHES == 5000
        assert cfg.ikfom.mapping.MAX_NUM_PC2MATCH == 10000
        assert cfg.ikfom.cov_gyro == pytest.approx(6.01e-4)
        assert cfg.ikfom.mapping.octree.min_extent == pytest.approx(0.2)
        assert not cfg.gravity_align
        assert cfg.time_offset
        # half-FoV conversion (main.cpp:143-146)
        assert cfg.filters.fov_angle == pytest.approx(180 * np.pi / 360.0)
        # lidar extrinsics parsed
        assert cfg.extrinsics.lidar2baselink_t[0] == pytest.approx(8.086759e-01)

    def test_all_reference_yamls_parse(self):
        for name in ("params", "kitti", "cat", "ona", "utbm"):
            cfg = Config.from_yaml(f"/root/reference/config/{name}.yaml")
            assert 0 <= cfg.sensor_type <= 4

    def test_derived_map_geometry(self):
        cfg = Config()
        cfg.ikfom.mapping.octree.min_extent = 0.3
        assert cfg.map_voxel_size == pytest.approx(0.6)
        cfg.tpu.map_voxel_size = 1.0
        assert cfg.map_voxel_size == 1.0


class TestTelemetry:
    def test_rates_and_board(self):
        t = Telemetry()
        for i in range(10):
            t.imu_tick(i * 0.01)
        t.scan_begin()
        t.scan_end(0.1)
        t.scan_begin()
        t.scan_end(0.2)
        s = t.stats()
        assert s["imu_hz"] == pytest.approx(100.0, rel=1e-6)
        assert s["lidar_hz"] == pytest.approx(10.0, rel=1e-6)
        board = t.board({"pos": np.zeros(3), "map_points": 42})
        assert "Map points: 42" in board
        assert "scans/s" in board


class TestCheckpoint:
    def test_roundtrip_liostate(self, tmp_path):
        cfg = ge._tiny_cfg()
        state = pl.init_state(cfg)
        state = state._replace(prev_scan_stamp=jnp.asarray(3.25, jnp.float32))
        p = str(tmp_path / "ck.npz")
        ckpt.save_state(p, state, extra={"epoch": 123.0})
        state2 = ckpt.load_state(p, pl.init_state(cfg))
        assert float(state2.prev_scan_stamp) == pytest.approx(3.25)
        np.testing.assert_array_equal(np.asarray(state2.map.counts),
                                      np.asarray(state.map.counts))
        assert ckpt.load_extra(p)["epoch"] == 123.0

    def test_shape_mismatch_rejected(self, tmp_path):
        cfg = ge._tiny_cfg()
        p = str(tmp_path / "ck.npz")
        ckpt.save_state(p, pl.init_state(cfg))
        cfg2 = ge._tiny_cfg(map_cap=8192)
        with pytest.raises(ValueError):
            ckpt.load_state(p, pl.init_state(cfg2))

    def test_localizer_restore_rebuilds_planar_mirror(self, tmp_path):
        """load_checkpoint must (a) rebuild the kNN planar mirror from the
        entry-major table — a checkpoint whose stored ptable has a stale
        lane layout (e.g. pre-round-4 E/SUB ordering, same shapes) must
        resume with a CORRECT mirror — and (b) reject checkpoints whose
        layout stamp disagrees (ADVICE r4, medium)."""
        from fast_limo_tpu.models import mapper
        from fast_limo_tpu.models.localizer import Localizer

        cfg = ge._tiny_cfg()
        loc = Localizer(cfg)
        loc.state = pl.init_state(cfg)
        rngl = np.random.default_rng(1)
        pts = jnp.asarray(rngl.uniform(-5, 5, (200, 3)).astype(np.float32))
        loc.state = loc.state._replace(map=mapper.insert(
            loc.state.map, pts, jnp.ones(200, bool),
            voxel_size=cfg.map_voxel_size))
        loc.epoch = 5.0
        p = str(tmp_path / "ck.npz")
        loc.save_checkpoint(p)

        # simulate an old-layout mirror: scramble the stored ptable lanes
        # (shape-preserving, like the round-4 E/SUB reorder)
        import json
        d = dict(np.load(p, allow_pickle=False))
        key = [k for k in d if k.endswith("ptable")][0]
        d[key] = d[key][:, ::-1].copy()
        np.savez_compressed(p, **d)

        loc2 = Localizer(cfg)
        loc2.load_checkpoint(p)
        want = mapper._planarize(loc2.state.map.table, loc2.state.map.bucket)
        np.testing.assert_array_equal(np.asarray(loc2.state.map.ptable),
                                      np.asarray(want))

        # stamp mismatch → loud rejection
        meta = json.loads(str(d["__meta__"]))
        meta["extra"]["map_layout"] = "block2x2x2/E8/SUB2/B2"
        d["__meta__"] = json.dumps(meta)
        np.savez_compressed(p, **d)
        with pytest.raises(ValueError, match="map layout"):
            Localizer(cfg).load_checkpoint(p)

    def test_pcd_roundtrip(self, tmp_path):
        from fast_limo_tpu.models import mapper

        m = mapper.create(1024, 2)
        rngl = np.random.default_rng(0)
        pts = rngl.uniform(-5, 5, (100, 3)).astype(np.float32)
        m = mapper.insert(m, jnp.asarray(pts), jnp.ones(100, bool), voxel_size=0.4)
        p = str(tmp_path / "map.pcd")
        n = ckpt.save_map_pcd(p, m)
        assert n == int(m.num_points)
        loaded = ckpt.load_map_pcd(p)
        assert loaded.shape == (n, 3)
        got = ckpt.map_points(m)
        np.testing.assert_allclose(np.sort(loaded, 0), np.sort(got, 0), atol=1e-5)
