"""P3M clustered-scene benchmark: dense vs two-level residual (ROADMAP 8).

The round-2 weak spot: a 1M scene with a 30k dense core overflows the P3M
cell binning, and the exact dense [M, M] residual-residual block costs
~7.3 s/eval at M ~ 29k. residual_mode='twolevel' replaces that block with a
refined submesh (band FFT + fine binned PP). This bench measures both on
the same scene: seconds/eval + median relative force error (overall, core,
field) against a direct-sum reference on a body sample via the rectangular
Pallas kernel.

    env PYTHONPATH=/root/repo:/root/.axon_site python -m nbx.bench.p3m_cluster \
        [n_total] [n_core] [mode ...]
    # defaults: 1000000 30000 dense twolevel
    # mode = dense|twolevel, optionally with a tune suffix
    #   mode@n_cells,K[,pp[,b]]   e.g. dense@12,768,pallas,b
    # trailing 'b' sizes occupancy-BUCKETED PP cells (pp_buckets_for)
    # pp = xla|pallas picks the main short-range implementation. The
    # ACCURACY-resolving tune needs h <= a/1.7 => n_cells <= g/5.1
    # (n_cells=12 at g=64) — affordable only on the pallas path
    # (nbx.ops.ppkernel); the round-2 default 25,96 has a/h = 0.85.

Methodology (CLAUDE.md): wall-clock around one jitted eval with the result
materialized; each dispatch stays well under the ~30 s tunnel limit.
"""

from __future__ import annotations

import json
import sys
import time

import jax.numpy as jnp
import numpy as np

from nbx.ops.p3m import p3m_acceleration

BOX = 100.0
EPS = 0.1


def cluster_scene(n_total: int, n_core: int, sigma: float = 1.5,
                  seed: int = 0):
    """The round-2 measured scene (docs/RESULTS.md 'adaptive residual'):
    quasi-uniform field across the full box — the uniform-cell premise
    holds for the bulk (1M over 25^3 cells = 64/cell < K=96) — plus a
    dense sigma=1.5 core at the center that overflows its cells."""
    rng = np.random.default_rng(seed)
    n_field = n_total - n_core
    field = rng.uniform(2.0, 98.0, (n_field, 3))
    core = rng.normal(50.0, sigma, (n_core, 3))
    core = np.clip(core, 2.0, 98.0)
    pos = np.concatenate([field, core]).astype(np.float32)
    mass = rng.uniform(0.5, 1.5, n_total).astype(np.float32)
    return jnp.asarray(pos), jnp.asarray(mass), n_field


def sample_errors(pos, mass, acc, n_field, n_sample: int = 4096, seed=1):
    """Median relative error vs direct sum on a half-field/half-core
    sample (rectangular Pallas kernel: sample targets x ALL sources)."""
    from nbx.ops.pairwise import pairwise_acc

    rng = np.random.default_rng(seed)
    n = pos.shape[0]
    half = n_sample // 2
    idx = np.concatenate([
        rng.choice(n_field, half, replace=False),
        n_field + rng.choice(n - n_field, half, replace=False),
    ])
    tgt = pos[jnp.asarray(idx)]
    ref = np.asarray(pairwise_acc(pos, mass, 1.0, EPS, target_pos=tgt))
    got = np.asarray(acc)[idx]
    err = np.linalg.norm(got - ref, axis=1) / (
        np.linalg.norm(ref, axis=1) + 1e-9
    )
    return dict(
        median=float(np.median(err)),
        core_median=float(np.median(err[half:])),
        field_median=float(np.median(err[:half])),
    )


def main(argv):
    n_total = int(argv[0]) if argv else 1_000_000
    n_core = int(argv[1]) if len(argv) > 1 else 30_000
    modes = argv[2:] or ["dense", "twolevel"]
    pos, mass, n_field = cluster_scene(n_total, n_core)

    for spec in modes:
        mode, n_cells, k, pp, pp_buckets = spec, 25, 96, "xla", None
        if "@" in spec:
            mode, rest = spec.split("@", 1)
            parts = rest.split(",")
            n_cells, k = int(parts[0]), int(parts[1])
            if len(parts) > 2:
                pp = parts[2]
            if len(parts) > 3 and parts[3] == "b":
                # occupancy-bucketed PP cells (VERDICT r3 next item 6)
                from nbx.ops.ppkernel import pp_buckets_for

                pp_buckets = pp_buckets_for(pos, BOX, n_cells, k)
                print(f"# pp_buckets={pp_buckets}", file=sys.stderr)
        # g=64: the round-2 measured base (0.72 s); g=128 alone costs 2.7 s.
        # Submesh: cost is subcells * 27 * sub_k^2 REGARDLESS of occupancy,
        # so size sub_k to the peak submesh-cell density and refine
        # sub_cells — (20, 384) measured 32G pair-lanes (~10 s of padding).
        # sub_g must resolve a1 (>= 3*sub_cells, enforced): (32, 48)@64
        # measured core err 2.6e-2 from the under-resolved band term.
        kw = dict(
            g=64, n_cells=n_cells, max_per_cell=k, eps=EPS,
            max_residual=32768, residual_mode=mode,
            sub_g=96, sub_cells=24, sub_k=96, pp_impl=pp,
            pp_buckets=pp_buckets,
        )
        acc, unc = p3m_acceleration(pos, mass, 1.0, BOX, **kw)
        np.asarray(acc)  # warm + materialize
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc, unc = p3m_acceleration(pos, mass, 1.0, BOX, **kw)
            np.asarray(acc)
            best = min(best, time.perf_counter() - t0)
        errs = sample_errors(pos, mass, acc, n_field)
        print(json.dumps(dict(
            n=n_total, n_core=n_core, mode=spec,
            s_per_eval=round(best, 3), n_uncorrected=int(unc), **errs,
        )), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
