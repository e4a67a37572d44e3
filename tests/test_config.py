"""SimConfig validation rejections (reference: config.rs:265-338)."""

import pytest

from peapods_tpu.engine.config import (
    ClusterConfig,
    OverlapBuildMode,
    OverlapClusterConfig,
    SimConfig,
    parse_overlap_modes,
)


def base(**kw):
    return SimConfig(n_sweeps=1, **kw)


def test_rejects_zero_pt_interval():
    with pytest.raises(ValueError, match="pt_interval"):
        base(pt_interval=0).validate()


def test_rejects_empty_overlap_modes():
    cfg = base(overlap_cluster=OverlapClusterConfig(interval=1, modes=()))
    with pytest.raises(ValueError, match="must not be empty"):
        cfg.validate()


def test_rejects_wolff_observe():
    cfg = base(cluster_update=ClusterConfig(interval=1, mode="wolff",
                                            action="observe"))
    with pytest.raises(ValueError, match="requires cluster_mode='sw'"):
        cfg.validate()


def test_rejects_houd4_observe():
    cfg = base(
        overlap_cluster=OverlapClusterConfig(
            interval=1,
            modes=(OverlapBuildMode("houdayer", 4),),
            cluster_mode="sw",
            action="observe",
        )
    )
    with pytest.raises(ValueError, match="houdN"):
        cfg.validate()


def test_rejects_fft_without_lag_and_accepts_with():
    with pytest.raises(ValueError, match="autocorrelation_max_lag"):
        base(autocorrelation_backend="fft").validate()
    base(autocorrelation_backend="fft", autocorrelation_max_lag=8).validate()


def test_snapshot_interval_must_be_multiple():
    cfg = base(
        overlap_cluster=OverlapClusterConfig(interval=2, snapshot_interval=3)
    )
    with pytest.raises(ValueError, match="positive multiple"):
        cfg.validate()


def test_warmup_cannot_exceed_sweeps():
    with pytest.raises(ValueError, match="warmup_sweeps"):
        SimConfig(n_sweeps=2, warmup_sweeps=3).validate()


def test_parse_overlap_modes_round_robin():
    modes = parse_overlap_modes("cmr+houd4+jorg")
    assert [m.kind for m in modes] == ["cmr", "houdayer", "jorg"]
    assert modes[1].group_size == 4


def test_houdn_parse_rejections():
    with pytest.raises(ValueError, match="even"):
        OverlapBuildMode.parse("houd3")
    with pytest.raises(ValueError, match="invalid Houdayer group size"):
        OverlapBuildMode.parse("houdx")
    with pytest.raises(ValueError, match="unknown overlap_cluster_build_mode"):
        OverlapBuildMode.parse("nope")
