"""Parameter sweeps over sizes/configurations (ported in full later this round)."""


def run_sweep(*args, **kwargs):
    raise NotImplementedError("run_sweep port in progress")
