"""Autocorrelation accumulator: ring == fft == brute force (reference:
statistics/autocorrelation.rs:310-373)."""

import numpy as np

from peapods_tpu.utils.autocorr import AutocorrStream, clamp_max_lag, sokal_tau


def deterministic_series(n, n_features=2):
    s = np.arange(n)[:, None]
    return np.stack(
        [((s[:, 0] * 13 % 31) / 8.0 - 2.0), ((s[:, 0] * 7 % 23) / 4.0 - 1.5)],
        axis=1,
    )[:, :n_features]


def brute_gamma(series, max_lag):
    series = series.astype(np.float32).astype(np.float64)
    n = len(series)
    mean = series.mean(0)
    var = (series**2).mean(0) - mean**2
    out = np.zeros((max_lag + 1, series.shape[1]))
    for delta in range(max_lag + 1):
        if n - delta <= 0 or (var <= 0).any():
            out[delta] = 1.0 if delta == 0 else 0.0
            continue
        prod = (series[delta:] * series[: n - delta]).sum(0) / (n - delta)
        out[delta] = (prod - mean**2) / var
    return out


def test_ring_matches_brute_force_across_blocks():
    series = deterministic_series(41)
    ring = AutocorrStream(7, 2, "ring")
    # push in uneven blocks to exercise the ring-history stitching
    for chunk in np.array_split(series, [5, 12, 30]):
        ring.push_block(chunk)
    np.testing.assert_allclose(ring.gamma(), brute_gamma(series, 7), atol=1e-12)


def test_fft_matches_ring_and_taus_agree():
    series = deterministic_series(128)
    ring = AutocorrStream(40, 2, "ring")
    fft = AutocorrStream(40, 2, "fft")
    for acc in (ring, fft):
        acc.push_block(series)
    np.testing.assert_allclose(fft.gamma(), ring.gamma(), atol=1e-10)
    np.testing.assert_allclose(fft.taus(), ring.taus(), atol=1e-10)


def test_degenerate_series():
    for backend in ("ring", "fft"):
        empty = AutocorrStream(4, 1, backend)
        np.testing.assert_array_equal(
            empty.gamma().ravel(), [1.0, 0.0, 0.0, 0.0, 0.0]
        )
        const = AutocorrStream(4, 1, backend)
        const.push_block(np.full((8, 1), 3.5))
        np.testing.assert_array_equal(
            const.gamma().ravel(), [1.0, 0.0, 0.0, 0.0, 0.0]
        )


def test_sokal_window_and_lag_clamp():
    gamma = np.exp(-np.arange(100) / 5.0)
    tau = sokal_tau(gamma)
    # integrated tau of exp(-t/5): 0.5 + sum exp(-t/5) ~ 5.0 (windowed)
    assert 3.0 < tau < 6.0
    assert clamp_max_lag(1000, 100) == 25
    assert clamp_max_lag(10, 100) == 10
    assert clamp_max_lag(1000, 0) == 1


def test_device_equil_checkpoint_prefix_consistency():
    """The on-device equilibration accumulator (engine/loop.py
    ac_equil_block): a 256-sweep run's first checkpoint (sweep 128) must
    equal a 128-sweep run's final checkpoint on the identical trajectory
    (the running averages are prefix sums of the same per-sweep values)."""
    import numpy as np
    from peapods_tpu import Ising

    def run(n):
        m = Ising(
            (8, 8),
            couplings="bimodal",
            temperatures=np.array([1.5, 2.5], np.float32),
            n_replicas=2,
            seed=11,
        )
        return m.sample(
            n, "metropolis", pt_interval=1, equilibration_diagnostic=True,
            warmup_ratio=0,
        )

    r256 = run(256)
    r128 = run(128)
    np.testing.assert_array_equal(r256["equil_sweeps"][:1], [128])
    np.testing.assert_array_equal(r128["equil_sweeps"], [128])
    np.testing.assert_allclose(
        r256["equil_energy_avg"][0], r128["equil_energy_avg"][0], rtol=2e-6
    )
    np.testing.assert_allclose(
        r256["equil_link_overlap_avg"][0],
        r128["equil_link_overlap_avg"][0],
        rtol=2e-6, atol=2e-6,
    )


def test_device_ring_matches_fft_backend():
    """Device-side ring accumulator vs host-side FFT series on the SAME
    trajectory (the backend choice never touches the RNG): integrated taus
    agree to float tolerance (ring == fft is the reference invariant,
    autocorrelation.rs:126-163)."""
    import numpy as np
    from peapods_tpu import Ising

    taus = {}
    for backend in ("ring", "fft"):
        m = Ising(
            (8, 8),
            couplings="ferro",
            temperatures=np.array([2.269, 3.0], np.float32),
            seed=13,
        )
        r = m.sample(
            200, "metropolis", autocorrelation_max_lag=16,
            autocorrelation_backend=backend, warmup_ratio=0.2,
        )
        taus[backend] = np.asarray(r["mags2_tau"], np.float64)
    np.testing.assert_allclose(taus["ring"], taus["fft"], rtol=1e-4)
