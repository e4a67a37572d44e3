"""Progress reporting (utils/progress.py) and its engine wiring."""

import io

import numpy as np

from peapods_tpu.engine.simulation import IsingSimulation
from peapods_tpu.utils.progress import ProgressPrinter


def test_progress_printer_renders_and_finishes():
    out = io.StringIO()
    p = ProgressPrinter(stream=out, min_interval=0.0)
    p(0, 100)
    p(50, 100)
    p(100, 100)
    text = out.getvalue()
    assert "50/100" in text and "100/100" in text
    assert text.endswith("\n")  # final newline exactly once at completion
    p(100, 100)
    assert out.getvalue().count("\n") == 1


def test_progress_rate_limited():
    out = io.StringIO()
    p = ProgressPrinter(stream=out, min_interval=3600.0)
    p(10, 100)  # first update always renders
    n = len(out.getvalue())
    p(20, 100)  # within the interval: suppressed
    p(30, 100)
    assert len(out.getvalue()) == n
    p(100, 100)  # completion always renders
    assert "100/100" in out.getvalue()


def test_engine_reports_progress_per_chunk():
    coup = np.ones((4, 4, 2), np.float32)
    sim = IsingSimulation([4, 4], coup, np.array([2.0], np.float32), 1,
                          None, 1, default_chunk=4)
    calls = []
    sim.sample(16, "metropolis", warmup_ratio=0,
               progress=lambda done, total: calls.append((done, total)))
    assert calls == [(4, 16), (8, 16), (12, 16), (16, 16)]
