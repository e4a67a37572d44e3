"""CLI smoke tests (subprocess; mirrors the reference's README CLI checks)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
ENV = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": str(REPO)}
FORCE_CPU = (
    "import jax; jax.config.update('jax_platforms', 'cpu'); "
    "from peapods_tpu.cli import main; import sys; sys.argv = ARGV; main()"
)


def run_cli(*args):
    code = FORCE_CPU.replace("ARGV", json.dumps(["peapods", *args]))
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=600,
    )


def test_simulate_prints_table_and_saves_npz(tmp_path):
    out = tmp_path / "results.npz"
    proc = run_cli(
        "simulate", "--shape", "4", "4", "--temp-min", "1.5", "--temp-max",
        "3.0", "--n-temps", "3", "--n-sweeps", "8", "--n-replicas", "2",
        "--pt-interval", "1", "--seed", "3", "-o", str(out),
    )
    assert proc.returncode == 0, proc.stderr
    assert "Binder" in proc.stdout
    with np.load(out) as data:
        assert "binder_cumulant" in data
        assert "sg_binder" in data
        assert "per_disorder_pt_edge_attempts" in data


def test_simulate_table_with_cluster_stats(tmp_path):
    """Top-4 column: top_cluster_sizes is a per-mode list of (n_temps, 4)
    arrays, not a per-temperature sequence — the table must render one quad
    per temperature (regression: TypeError in _fmt_top4)."""
    proc = run_cli(
        "simulate", "--shape", "4", "4", "--temp-min", "1.5", "--temp-max",
        "3.0", "--n-temps", "3", "--n-sweeps", "16", "--n-replicas", "2",
        "--pt-interval", "1", "--cluster-interval", "4",
        "--overlap-cluster-update-interval", "8", "--collect-cluster-stats",
        "--seed", "3",
    )
    assert proc.returncode == 0, proc.stderr
    assert "Top-4 Clusters" in proc.stdout
    quads = [ln for ln in proc.stdout.splitlines() if ln.rstrip().endswith(")")]
    assert len(quads) == 3, proc.stdout


def test_bench_reports_ms_per_sweep():
    proc = run_cli(
        "bench", "--shape", "4", "4", "--temp-min", "1.0", "--temp-max",
        "2.0", "--n-temps", "2", "--n-sweeps", "4", "--seed", "1",
    )
    assert proc.returncode == 0, proc.stderr
    assert "ms/sweep" in proc.stdout


def test_sweep_runs_from_toml(tmp_path):
    config = tmp_path / "cfg.toml"
    config.write_text(
        "\n".join(
            [
                "[lattice]",
                "sizes = [[4, 4]]",
                "[temperatures]",
                "min = 1.0",
                "max = 2.0",
                "count = 2",
                "[sampling]",
                "n_sweeps = 4",
                "seed = 5",
                "[output]",
                "save_data = true",
                f'dir = "{tmp_path}"',
            ]
        )
    )
    proc = run_cli("sweep", "--config", str(config))
    assert proc.returncode == 0, proc.stderr
    assert (tmp_path / "sweep_ferro.npz").exists()
