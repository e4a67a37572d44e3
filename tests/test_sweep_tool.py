"""run_sweep end-to-end: npz schema, plots, and snapshot round-trip."""

import matplotlib

matplotlib.use("Agg")

import numpy as np

from peapods_tpu.plot.cluster_snapshots import SnapshotSet
from peapods_tpu.sweep import run_sweep


def test_run_sweep_saves_npz_and_plots(tmp_path):
    results = run_sweep(
        [(4, 4)],
        couplings=("bimodal",),
        temperatures=np.array([1.0, 2.0], dtype=np.float32),
        n_replicas=2,
        n_disorder=2,
        n_sweeps=8,
        pt_interval=1,
        overlap_cluster_update_interval=2,
        overlap_cluster_build_modes=("cmr",),
        overlap_cluster_modes=("sw",),
        collect_cluster_stats=True,
        snapshot_interval=4,
        warmup_ratio=0.25,
        save_data=True,
        save_plots=True,
        output_dir=str(tmp_path),
        seed=9,
    )
    assert "bimodal_cmr_sw" in results
    model = results["bimodal_cmr_sw"]["4x4"]
    assert hasattr(model, "sg_binder")

    npz = tmp_path / "sweep_bimodal_cmr_sw.npz"
    assert npz.exists()
    with np.load(npz) as data:
        keys = set(data.files)
        assert "temperatures" in keys
        assert "4x4_sg_binder" in keys
        assert "4x4_per_sample_overlap_histogram" in keys
        assert "4x4_snapshot_cluster_ids" in keys
        assert "4x4_snapshot_blue_ids" in keys  # CMR snapshots carry blue ids
        assert "4x4_per_disorder_pt_edge_attempts" in keys
    assert (tmp_path / "binder_bimodal_cmr_sw.png").exists()
    assert (tmp_path / "pq_4x4_bimodal_cmr_sw.png").exists()

    # snapshot viewer consumes the same npz
    snaps = SnapshotSet.from_npz(npz)
    img = snaps.rgb(0, 0)
    assert img.shape == (4, 4, 3)
