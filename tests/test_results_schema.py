"""Results-dict schema parity with the reference PyO3 marshalling layer.

Key names, dtypes, shapes, and presence conditions follow
``/root/reference/src/lib.rs:337-617``; this test pins them per
configuration class.
"""

import numpy as np

from peapods_tpu import Ising

BASE_KEYS = {"mags", "mags2", "mags4", "energies", "energies2"}
OVERLAP_KEYS = {
    "overlap", "overlap2", "overlap4",
    "link_overlap", "link_overlap2", "link_overlap4",
    "overlap_histogram", "ql_at_q_sum", "ql2_at_q_sum",
}
PER_SAMPLE_KEYS = {
    "per_sample_overlap_histogram",
    "per_sample_ql_at_q_sum",
    "per_sample_ql2_at_q_sum",
}


def test_minimal_run_has_only_base_keys():
    r = Ising((4, 4), temperatures=np.array([2.0]), seed=1).sample(
        4, warmup_ratio=0
    )
    assert BASE_KEYS <= set(r)
    assert not (OVERLAP_KEYS & set(r))
    assert "per_disorder" not in r
    assert "fk_csd" not in r
    for k in BASE_KEYS:
        assert r[k].dtype == np.float64 and r[k].shape == (1,)


def test_replica_run_exposes_overlap_block():
    r = Ising(
        (4, 4), couplings="bimodal", temperatures=np.array([1.0, 2.0]),
        n_replicas=2, seed=2,
    ).sample(4, warmup_ratio=0)
    assert OVERLAP_KEYS <= set(r)
    assert not (PER_SAMPLE_KEYS & set(r))  # single disorder sample
    # histogram: list of per-temp uint64 arrays with n_spins+1 bins
    assert isinstance(r["overlap_histogram"], list)
    assert len(r["overlap_histogram"]) == 2
    assert r["overlap_histogram"][0].dtype == np.uint64
    assert r["overlap_histogram"][0].shape == (17,)
    assert r["ql_at_q_sum"].shape == (2, 17)


def test_multi_disorder_retains_per_sample_histograms():
    r = Ising(
        (4, 4), couplings="bimodal", temperatures=np.array([1.5]),
        n_replicas=2, n_disorder=3, seed=3,
    ).sample(4, warmup_ratio=0)
    assert PER_SAMPLE_KEYS <= set(r)
    assert r["per_sample_overlap_histogram"].shape == (3, 1, 17)
    assert r["per_sample_overlap_histogram"].dtype == np.uint64
    assert r["per_sample_ql_at_q_sum"].dtype == np.float64


def test_cluster_stats_and_pt_blocks():
    r = Ising(
        (4, 4), couplings="bimodal", temperatures=np.array([1.0, 3.0]),
        n_replicas=2, seed=4,
    ).sample(
        8,
        cluster_update_interval=1,
        cluster_mode="sw",
        overlap_cluster_update_interval=2,
        overlap_cluster_build_mode="cmr+houdayer",
        overlap_cluster_mode="sw",
        collect_cluster_stats=True,
        pt_interval=1,
        autocorrelation_max_lag=4,
        equilibration_diagnostic=True,
        warmup_ratio=0,
    )
    # fk_csd: list of per-temp uint64 histograms
    assert len(r["fk_csd"]) == 2 and r["fk_csd"][0].shape == (17,)
    # overlap_csd: [mode][temp] lists
    assert len(r["overlap_csd"]) == 2
    assert len(r["overlap_csd"][0]) == 2
    # top_cluster_sizes: per-mode (n_temps, 4) f64
    assert len(r["top_cluster_sizes"]) == 2
    assert r["top_cluster_sizes"][0].shape == (2, 4)
    # diagnostics
    assert r["mags2_tau"].shape == (2,)
    assert r["overlap2_tau"].shape == (2,)
    assert r["equil_sweeps"].dtype == np.uint64
    assert r["equil_energy_avg"].shape == (len(r["equil_sweeps"]), 2)
    # per_disorder PT block
    pt = r["per_disorder"]["parallel_tempering"]
    assert pt["edge_attempts"].shape == (1, 1)
    assert pt["round_trips"].shape == (1, 2, 2)


def test_observe_emits_graph_observations_with_winding_on_canonical():
    r = Ising(
        (4, 4), temperatures=np.array([1.5]), seed=5
    ).sample(
        2,
        cluster_update_interval=1,
        cluster_mode="sw",
        cluster_action="observe",
        warmup_ratio=0,
    )
    fk = r["per_disorder"]["cluster_observations"]["fk"]
    expected_fields = {
        "observation_count", "cluster_size_counts",
        "top_four_component_fractions", "active_bond_density",
        "large_component_count", "winding_x", "winding_y",
        "winding_either", "winding_both",
    }
    assert expected_fields == set(fk)
    assert fk["active_bond_density"].dtype == np.float64
    assert (fk["active_bond_density"] <= 1.0).all()
