"""Fortieth-wave tests: Spearman rank-degree, Otsu threshold, gate
kappa."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave40 import (
    q_gate_kappa,
    q_otsu_threshold,
    q_rank_degree_spearman,
)


def test_spearman_bounds_and_sign(ray_session, sf_dir):
    row = q_rank_degree_spearman(sf_dir).to_pandas().iloc[0]
    assert row["n"] == 500
    assert -1.0 <= row["rho"] <= 1.0
    # in-degree drives PageRank on a fixed-damping graph: positive rho
    assert row["rho"] > 0.3
    assert (row["num"] > 0) == (row["rho"] > 0)


def test_otsu_hand_case(ray_session, tmp_path):
    # two clear clusters: 100,101,102 and 500,501 -> threshold at 102
    vals = [100, 101, 102, 500, 501]
    tbl = pa.table({"n_chars": pa.array(vals, pa.int64())})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    row = q_otsu_threshold(str(tmp_path)).to_pandas().iloc[0]
    assert row["threshold"] == 102
    assert row["n0"] == 3 and row["n1"] == 2
    assert row["s0"] == 303 and row["s1"] == 1001


def test_otsu_classes_nonempty(ray_session, sf_dir):
    row = q_otsu_threshold(sf_dir).to_pandas().iloc[0]
    assert row["n0"] > 0 and row["n1"] > 0
    assert row["n0"] + row["n1"] == 500
    assert row["objective_q"] > 0


def test_gate_kappa_range(ray_session, sf_dir):
    row = q_gate_kappa(sf_dir).to_pandas().iloc[0]
    n = row[["n11", "n10", "n01", "n00"]].sum()
    assert n == 500
    assert -1.0 <= row["kappa"] <= 1.0
    # both gates keep SOME and drop SOME docs (non-degenerate table)
    assert row["n11"] > 0 and row["n00"] > 0
