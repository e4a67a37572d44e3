"""On-chip exactness + microbench of the matmul histogram (round 5).

`cluster._hist_matmul` replaced the scatter-add implementations of
`component_counts` / `csd_histogram` (XLA TPU scatter is serialized,
~0.6 ms per 64k updates — benchmarks/cc_contract_probe.py; it dominated
cluster-statistics collection).  The matmul form is exact integer math
(int8 one-hot factors, int32 MXU accumulation), so its outputs must be
BITWISE the scatter's — this job asserts that on the real backend at the
production sizes, then times both forms.

Run serialized (one TPU process at a time, CLAUDE.md).
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from peapods_tpu.ops import cluster as cl

    print("devices:", jax.devices(), flush=True)

    def scatter_counts(labels):
        n = labels.shape[0]
        return jnp.zeros(n, dtype=jnp.int32).at[labels].add(1)

    def scatter_csd(counts):
        n = counts.shape[0]
        return jnp.zeros(n + 1, dtype=jnp.int32).at[counts].add(
            (counts > 0).astype(jnp.int32)
        )

    rng = np.random.default_rng(11)
    for tag, batch, n in (("cfg5_tasks", 384, 4096), ("fk_256sq", 1, 65536)):
        # adversarial label sets: clustered values (realistic min-labels),
        # all-equal, all-distinct
        labs = np.minimum(
            rng.integers(0, n, (batch, n)), rng.integers(0, n, (batch, n))
        ).astype(np.int32)
        labs[0, :] = 0
        if batch > 1:
            labs[1, :] = np.arange(n)
        labs_j = jnp.asarray(labs)

        mm_counts = jax.jit(jax.vmap(cl.component_counts))
        sc_counts = jax.jit(jax.vmap(scatter_counts))
        a = np.asarray(mm_counts(labs_j))
        b = np.asarray(sc_counts(labs_j))
        np.testing.assert_array_equal(a, b, err_msg=f"{tag} counts")

        counts_j = jnp.asarray(a)
        mm_csd = jax.jit(jax.vmap(cl.csd_histogram))
        sc_csd = jax.jit(jax.vmap(scatter_csd))
        c = np.asarray(mm_csd(counts_j))
        d = np.asarray(sc_csd(counts_j))
        np.testing.assert_array_equal(c, d, err_msg=f"{tag} csd")

        def t(f, x):
            f(x).block_until_ready()
            reps = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(f(x)[0, :1])  # host fetch = real sync
                reps.append((time.perf_counter() - t0) * 1e3)
            return round(float(np.median(reps)), 3)

        print(json.dumps({
            "section": "hist_check", "case": tag, "exact": True,
            "ms": {
                "counts_matmul": t(mm_counts, labs_j),
                "counts_scatter": t(sc_counts, labs_j),
                "csd_matmul": t(mm_csd, counts_j),
                "csd_scatter": t(sc_csd, counts_j),
            },
        }), flush=True)


if __name__ == "__main__":
    main()
